package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cost of the rewritten dd2 pipeline. */
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
      t("shingle expr only")(noop(docs.select(col("doc_id"),
        graft.functions.TextExprs.shingle_hash_set(col("text"), 5).as("shs"))))
      val indexRows = docs.repartition(32)
        .select(col("doc_id"),
          graft.functions.TextExprs.shingle_hash_set(col("text"), 5).as("shs"))
        .select(col("doc_id"), size(col("shs")).cast("long").as("sz"),
          explode(col("shs")).as("sh64"))
      t("explode rows")(noop(indexRows))
      t("agg count only")(noop(indexRows.groupBy("sh64").agg(count(lit(1)).as("c"))))
      t("agg collect_set")(noop(indexRows.groupBy("sh64")
        .agg(collect_set(struct(col("doc_id"), col("sz"))).as("ids"))
        .filter(size(col("ids")).between(2, 100))))
      val bySh = indexRows.groupBy("sh64")
        .agg(graft.functions.BoundedDocSetAggregate
          .bounded_doc_set(col("doc_id"), col("sz"), 100).as("ids"))
        .filter(size(col("ids")).between(2, 100))
      t("agg bySh")(noop(bySh))
      t("full dd2")(noop(
        graft.ops.TextDedup.jaccardPairs(docs, "doc_id", "text", 5, 0.8, 100)))
    }
    spark.stop()
  }
}
