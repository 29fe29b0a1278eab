package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dd6 cost split — pair generation vs the CC label loop. */
object ProbeDd6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      val pairs = graft.ops.TextDedup.minhashDedupPairs(docs, "doc_id", "text", 5, 16, 8, 0.8)
      val mat = t(s"pairs rep$rep") { val c = pairs.cache(); c.count(); c }
      t(s"cc-loop rep$rep") {
        graft.ops.TextDedup.duplicateGroups(mat)
          .write.mode("overwrite").format("noop").save()
      }
      mat.unpersist()
    }
    spark.stop()
  }
}
