package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextDedup
import org.apache.spark.sql.expressions.Window

/** Stage-level timing of the dd3 minhash-LSH pipeline at a given sf. */
object ProbeDd3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ds = TextDedup.docShingles(docs, "doc_id", "text", 5)
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id"))).cache()
    t("shingles+window+cache")(ds.count())
    val sigs = TextDedup.minhashSignatures(ds, 16)
    t("signatures")(sigs.write.mode("overwrite").format("noop").save())
    val cands = TextDedup.lshCandidates(TextDedup.lshBuckets(sigs, 8, 2))
    t("buckets+cands")(cands.write.mode("overwrite").format("noop").save())
    val full = TextDedup.minhashDedupPairs(docs, "doc_id", "text", 5, 16, 8, 0.8)
    t("full-second-run")(full.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
