package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: q26 component costs — which exact-median strategy wins. */
object Q26Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    li.limit(1).count()
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def bench(label: String)(f: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-26s min=${times.min}%.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    bench("A_sketches_acc1000") {
      li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("acd"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("amed"))
    }
    bench("A_sketches_acc10000") {
      li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("acd"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("amed"))
    }
    bench("B_distinct_cnt_hll") {
      li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("acd"))
    }
    bench("C_preagg_pct_freq") {
      li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5D, cnt)").as("emed"))
    }
    bench("D_window_median") {
      val pre = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
      val tot = pre.groupBy("l_returnflag").agg(sum("cnt").as("n"))
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ranks of the two middle elements (equal when n is odd)
      pre.join(tot, "l_returnflag")
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("k1", (col("n") + 1) / 2)
        .withColumn("k2", (col("n") + 2) / 2)
        .filter(col("cum") - col("cnt") < col("k2") && col("k1") <= col("cum"))
        .groupBy("l_returnflag")
        .agg((sum(col("l_extendedprice") *
          (when(col("cum") - col("cnt") < col("k1") && col("k1") <= col("cum"), 1).otherwise(0) +
           when(col("cum") - col("cnt") < col("k2") && col("k2") <= col("cum"), 1).otherwise(0))) / 2)
          .as("emed"))
    }
    bench("E_exact_percentile") {
      li.groupBy("l_returnflag").agg(expr("percentile(l_extendedprice, 0.5)").as("emed"))
    }
    // sanity: values agree
    val c = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D, cnt)").as("emed_c"))
    val e = li.groupBy("l_returnflag").agg(expr("percentile(l_extendedprice, 0.5)").as("emed_e"))
    c.join(e, "l_returnflag").show(false)
    spark.stop()
  }
}
