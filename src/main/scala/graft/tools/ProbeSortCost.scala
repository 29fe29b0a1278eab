package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: how much does the final presentation orderBy cost per
  * query? Times each named query as-written vs with the top Sort node
  * logically stripped (re-running the same plan minus the final sort).
  */
object ProbeSortCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1 && args(1) != "all") args.drop(1).toSeq
      else if (args.length > 1) graft.SparkEntry.queries.keys.toSeq.sorted
      else Seq("tx5_winnow", "tx10_chunking", "ev2_sessionize", "ev3_window_10min",
        "tx1_langid", "tx11_pii_redaction", "dd4_dedup_simhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sfDir)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var totalW = 0.0; var totalN = 0.0
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val stripped = {
        import org.apache.spark.sql.catalyst.plans.logical.Sort
        val lp = df.queryExecution.analyzed match {
          case Sort(_, true, child, _) => child
          case other => other
        }
        org.apache.spark.sql.GraftBridge.ofRows(spark, lp)
      }
      def run(d: org.apache.spark.sql.DataFrame) =
        d.write.mode("overwrite").format("noop").save()
      run(df); run(stripped) // warm both
      val w = (0 until 3).map(_ => time(run(df))).min
      val n = (0 until 3).map(_ => time(run(stripped))).min
      println(f"$name%-22s sorted=$w%.3f stripped=$n%.3f delta=${w - n}%.3f")
      totalW += w; totalN += n
    }
    println(f"TOTAL sorted=$totalW%.2f stripped=$totalN%.2f sort-tax=${totalW - totalN}%.2f")
    spark.stop()
  }
}
