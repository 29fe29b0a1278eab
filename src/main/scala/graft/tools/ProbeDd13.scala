package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeDd13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, d, "documents")
    val spread = docs.repartition(32, col("doc_id"))
    def time(tag: String)(f: => Unit): Unit = {
      for (_ <- 1 to 3) { val t0=System.nanoTime(); f; println(tag+": "+(System.nanoTime()-t0)/1e9) }
    }
    val sigRows = spread.select(col("source"),
        graft.functions.TextExprs.minhash_sig_hex(col("text"), 5, 16).as("mh"))
      .where(col("mh").isNotNull)
      .select(col("source"), posexplode(col("mh")).as(Seq("j", "h")))
    time("sigRows")(sigRows.write.mode("overwrite").format("noop").save())
    val minAgg = sigRows.groupBy("source", "j").agg(min("h").as("h"))
    time("minAgg")(minAgg.write.mode("overwrite").format("noop").save())
    val sig = minAgg.groupBy("source")
      .agg(expr("transform(array_sort(collect_list(struct(j, h))), x -> x.h)").as("sig"))
    time("sig")(sig.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
