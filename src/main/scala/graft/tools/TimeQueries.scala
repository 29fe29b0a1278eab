package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf probe: time individual SparkEntry queries under the SAME session
  * configuration Bench uses (so numbers transfer 1:1), min-of-N reps.
  *
  *   scripts/run.sh graft.tools.TimeQueries <sfDir> <reps> <query> [query ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, repsS, rest @ _*) = args.toSeq: @unchecked
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Sessions.tune(spark)
    graft.Tables.register(spark, sfDir)
    graft.SparkEntry.queries("q02_filter_predicates")(spark, sfDir)
      .write.mode("overwrite").format("noop").save() // warm session
    rest.foreach { q =>
      var best = Double.MaxValue
      for (_ <- 0 until reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$q $best%.3f s")
    }
    spark.stop()
  }
}
