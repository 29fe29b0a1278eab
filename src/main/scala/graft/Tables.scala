package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-provided parquet tables (TESTDATA.md) and registers
  * them as temp views so both the DataFrame API and `spark.sql` paths can
  * reach them. Mirrors the reference's per-query schema reload
  * (seafowl `src/context/mod.rs:89-112`) but memoized per directory —
  * re-registering on every query would re-read footers needlessly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Parquet TIMESTAMP(NANOS) is read as LongType under
    // spark.sql.legacy.parquet.nanosAsLong (set in GraftSession/Verify/
    // Bench); surface it as a µs TimestampType column like every other
    // engine (DuckDB truncates ns→µs the same way).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) if name == "events" =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  // One registration per (session, dir); temp views are session-scoped.
  private val registered = new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Boolean]()

  /** Register all tables of `dir` as temp views in `spark` (idempotent). */
  def register(spark: SparkSession, dir: String): Unit =
    registered.computeIfAbsent((spark, dir), { _ =>
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      true
    })

  /** Register views and run a SQL statement against them. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
