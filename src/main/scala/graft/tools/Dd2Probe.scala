package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dd2 cost under the bench's min-of-3 protocol, plus a
  * breakdown over the real pipeline's cached shingle set. */
object Dd2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()

    def full(): Unit =
      graft.ops.TextDedup.jaccardPairs(docs, "doc_id", "text", 5, 0.8, 100)
        .orderBy("id1", "id2").write.mode("overwrite").format("noop").save()

    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      t(s"full dd2 rep$i")(full())
    }
    // breakdown over the pipeline's own cached shingles
    spark.catalog.clearCache()
    val ds = graft.ops.TextDedup.docShingles(docs, "doc_id", "text", 5).cache()
    t("ds materialize") { println("  rows " + ds.count()) }
    t("sizes") { ds.groupBy("doc_id").agg(count(lit(1))).write.mode("overwrite").format("noop").save() }
    val hot = ds.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 100).select("shingle")
    t("hot") { println("  hot " + hot.count()) }
    val bySh = ds.join(hot, Seq("shingle"), "left_anti")
      .groupBy("shingle").agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
    t("bySh+pairs") {
      bySh.select(col("ids"), explode(col("ids")).as("id1"))
        .select(col("id1"), explode(col("ids")).as("id2"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
