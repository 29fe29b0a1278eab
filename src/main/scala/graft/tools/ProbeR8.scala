package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 plan probe: print the physical plans of the new queries so
  * the shuffle/join strategy can be audited (binned interval join must
  * be a shuffled equi-join, never a nested loop; PageRank iterations
  * must be join+partial-agg shapes). */
object ProbeR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val picked =
      if (args.length <= 1) Seq("ev12_interval_join", "ev13_anomaly", "gr1_pagerank", "em2_pca_gram")
      else args.drop(1).toSeq
    for (n <- picked) {
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
