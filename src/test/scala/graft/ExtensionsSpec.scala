package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make engine functions available to a PLAIN
  * SparkSession via spark.sql.extensions — no GraftContext involved. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions exposes dot_q in SQL") {
    // spark.sql.extensions is a STATIC conf: it only takes effect when the
    // SparkContext itself is created with it. Stop any context a previous
    // suite left running so the builder constructs a fresh one; stop ours
    // afterwards so later suites likewise build fresh (suites run
    // sequentially in the forked test JVM).
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql("SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .collect().head.getLong(0)
      assert(r === 32L)
      // bloom sketch + probe round-trip through pure SQL (scalar subquery
      // folds the sketch into the probing plan)
      val hits = spark.sql(
        """SELECT id, might_contain(
          |  (SELECT bloom_filter_agg(id * 37) FROM range(0, 50)), id * 37) AS hit
          |FROM range(0, 100)""".stripMargin)
        .collect().map(row => (row.getLong(0), row.getBoolean(1)))
      assert(hits.filter(_._1 < 50).forall(_._2), "no false negatives")
      assert(hits.count(x => x._1 >= 50 && x._2) < 25, "fp rate sane")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
