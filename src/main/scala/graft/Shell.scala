package graft

import graft.sql.GraftContext
import org.apache.spark.sql.SparkSession

/** One-off SQL execution against a graft data directory (the analog of the
  * reference's CLI frontend, `src/cli/mod.rs` one-off mode):
  *
  *   scripts/run.sh graft.Shell <dataDir> "<sql>[; <sql>...]"
  *
  * Executes every statement; prints the last statement's result as
  * JSON-lines (the same encoding the HTTP frontend streams).
  */
object Shell {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Shell <dataDir> <sql>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.tune(spark)
    val ctx = new GraftContext(spark, args(0))
    val result = ctx.executeAll(args.drop(1).mkString(" "))
    result.toJSON.collect().foreach(println)
    spark.stop()
  }
}
