package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cost of the rewritten dd3 pipeline. */
object ProbeStage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val withSets = docs.repartition(32)
        .select(col("doc_id"),
          graft.functions.TextExprs.minhash_band_keys(col("text"), 5, 16, 8).as("bks"),
          graft.functions.TextExprs.shingle_hash_set(col("text"), 5).as("shs"))
        .filter(col("bks").isNotNull)
      t("bandkeys only")(noop(docs.repartition(32).select(col("doc_id"),
        graft.functions.TextExprs.minhash_band_keys(col("text"), 5, 16, 8).as("bks"))))
      t("withSets")(noop(withSets))
      val cands = withSets
        .select(col("doc_id"), explode(col("bks")).as("bucket"))
        .groupBy("bucket").agg(collect_set(col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(col("ids"), explode(col("ids")).as("id1"))
        .select(col("id1"), explode(col("ids")).as("id2"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct()
      t("cands")(noop(cands))
      t("full dd3")(noop(
        graft.ops.TextDedup.minhashDedupPairs(docs, "doc_id", "text", 5, 16, 8, 0.8)))
    }
    spark.stop()
  }
}
