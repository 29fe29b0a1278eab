package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf probe: time individual SparkEntry queries under configurable
  * session settings (iterate on shuffle sizing / AQE without touching
  * Bench).
  *
  *   scripts/run.sh graft.tools.TimeQueries <sfDir> <shufflePartitions> \
  *     <aqe:true|false> <query> [query ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, parts, aqe, rest @ _*) = args.toSeq: @unchecked
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sfDir)
    graft.SparkEntry.queries("q02_filter_predicates")(spark, sfDir)
      .write.mode("overwrite").format("noop").save() // warm session
    rest.foreach { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"$q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
