package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make engine functions available to a PLAIN
  * SparkSession via spark.sql.extensions — no GraftContext involved. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions exposes dot_q in SQL") {
    // clear the default session so the builder constructs a NEW session
    // (with extensions applied) over the JVM's shared SparkContext —
    // and do NOT stop() it, which would kill the context other suites use
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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
