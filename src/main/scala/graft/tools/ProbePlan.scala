package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: print the formatted physical plan of any SparkEntry query.
  * Usage: scripts/run.sh graft.tools.ProbePlan <query-name> [sfDir]
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
