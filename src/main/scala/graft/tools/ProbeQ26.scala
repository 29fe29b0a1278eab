package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeQ26 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm")(li.limit(1).count())
    t("exact-cd")(li.groupBy("l_returnflag").agg(countDistinct("l_partkey")).write.mode("overwrite").format("noop").save())
    t("approx-pair")(li.groupBy("l_returnflag").agg(approx_count_distinct(col("l_partkey")),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))).write.mode("overwrite").format("noop").save())
    t("exact-pct")(li.groupBy("l_returnflag").agg(expr("percentile(l_extendedprice, 0.5)")).write.mode("overwrite").format("noop").save())
    t("all-in-one")(li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey")).as("acd"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("amed"),
      expr("percentile(l_extendedprice, 0.5)").as("emed")).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
