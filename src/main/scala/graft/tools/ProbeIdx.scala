package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.GraftTable
object ProbeIdx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("probe-idx").toString
    val t = GraftTable.create(spark, root, StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    (0 until 10).foreach(b => t.append(Seq((b*100L, s"b$b"), (b*100L+1, s"b$b")).toDF("id","v")))
    val q = t.read().filter(col("id") === 500L)
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.get
    println("numFiles metric: " + scan.metrics("numFiles").value + " of " + t.latestManifest.files.size)
    spark.stop()
  }
}
