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

  // Memoize the ANALYZED DataFrame per (session, dir, table): DataFrame
  // plans are immutable and freely reusable across statements, and a
  // fresh spark.read.parquet pays driver-side file listing + footer
  // schema inference EVERY call — per statement, per table, it is a
  // fixed ~50-150 ms tax that a catalog (and any real engine's table
  // resolution) caches away. This is the single biggest slice of the
  // per-query floor at bench scale and pure overhead at any scale.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.computeIfAbsent((spark, dir, name), { _ => loadFresh(spark, dir, name) })

  private def loadFresh(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize events.ts to a µs TimestampType regardless of how the
    // driver generated the parquet: TIMESTAMP(NANOS) is read as LongType
    // under spark.sql.legacy.parquet.nanosAsLong (set in GraftSession/
    // Verify/Bench) and truncates ns→µs like DuckDB; TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) is read as TIMESTAMP_NTZ and re-anchors as
    // the same UTC wall-clock (session tz is pinned to UTC), so
    // unix_micros(ts) yields the identical value either way.
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", df.col("ts").cast(TimestampType))
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
