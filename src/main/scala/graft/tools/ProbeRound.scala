package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: is `round(double)` (BigDecimal per row) a material slice
  * of the quantile family's scan stages? Times the histogram pass with
  * three cents spellings over the same parquet. */
object ProbeRound {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label best=$best%6.3f")
    }
    timed("baseline-count      ")(li.select(col("l_returnflag")).groupBy("l_returnflag").count())
    timed("round-cast          ")(li.select(col("l_returnflag").as("k"),
      round(col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("k"), shiftright(col("v"), 14)).count())
    timed("floor-half-cast     ")(li.select(col("l_returnflag").as("k"),
      (col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      .groupBy(col("k"), shiftright(col("v"), 14)).count())
    timed("plain-cast          ")(li.select(col("l_returnflag").as("k"),
      (col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("k"), shiftright(col("v"), 14)).count())
    println("-- reversed --")
    timed("plain-cast          ")(li.select(col("l_returnflag").as("k"),
      (col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("k"), shiftright(col("v"), 14)).count())
    timed("floor-half-cast     ")(li.select(col("l_returnflag").as("k"),
      (col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      .groupBy(col("k"), shiftright(col("v"), 14)).count())
    timed("round-cast          ")(li.select(col("l_returnflag").as("k"),
      round(col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("k"), shiftright(col("v"), 14)).count())
    spark.stop()
  }
}
