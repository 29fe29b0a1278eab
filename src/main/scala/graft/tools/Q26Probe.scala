package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which aggregate dominates q26. */
object Q26Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    li.count() // warm scan
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    (1 to 2).foreach { rep =>
      t(s"hll+approxq rep$rep") { noop(li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("acd"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("amed"))) }
      t(s"exact percentile rep$rep") { noop(li.groupBy("l_returnflag").agg(
        expr("percentile(l_extendedprice, 0.5)").as("emed"))) }
      t(s"median() rep$rep") { noop(li.groupBy("l_returnflag").agg(
        expr("median(l_extendedprice)").as("emed"))) }
      t(s"countDistinct rep$rep") { noop(li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("n"))) }
      t(s"distinct+count rep$rep") { noop(li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").count()) }
    }
    spark.stop()
  }
}
