package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: Spark 4.1 LATERAL-subquery syntax/plan + distribution window
  * functions, before wiring q40/q41 QueryDefs. */
object ProbeLateral {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    val lat = """SELECT n_name, top_cust, top_bal FROM nation n,
      |LATERAL (SELECT c_custkey AS top_cust, c_acctbal AS top_bal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n_name, top_bal DESC, top_cust""".stripMargin
    val d1 = spark.sql(lat)
    d1.show(6, false)
    d1.explain("formatted")
    val win = """SELECT c_custkey, c_nationkey, pr, cd, nv
      |FROM (
      |  SELECT c_custkey, c_nationkey,
      |    PERCENT_RANK() OVER w AS pr,
      |    CUME_DIST() OVER w AS cd,
      |    NTH_VALUE(c_custkey, 2) OVER w AS nv
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |) x WHERE c_custkey <= 300
      |ORDER BY c_custkey""".stripMargin
    val d2 = spark.sql(win)
    d2.show(6, false)
    spark.stop()
  }
}
