package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the final-ORDER-BY spelling on an aggregate-small result: global
  * orderBy (range exchange + hidden sampling job over the reduce side) vs
  * coalesce(1).sortWithinPartitions (one task, no sampling, identical
  * total order). Usage: scripts/run.sh graft.tools.ProbeOrderBy <sfDir> */
object ProbeOrderBy {
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
    def agg = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 6) {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label best=$best%6.3f")
    }
    timed("orderBy          ")(agg.orderBy("l_returnflag", "l_linestatus"))
    timed("coalesce1+sortWP ")(agg.coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus"))
    timed("noSort           ")(agg)
    timed("orderBy2         ")(agg.orderBy("l_returnflag", "l_linestatus"))
    spark.stop()
  }
}
