package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: Spark 4.1 recursive-CTE (UnionLoop) plan shape + timing for the
  * q39 reachability query — run before wiring the QueryDef so the
  * recursion limit, join shape inside the loop, and result agreement with
  * the DuckDB prototype are all observed, not assumed.
  *
  *   scripts/run.sh graft.tools.ProbeRec <sfDir>
  */
object ProbeRec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    val q = """WITH RECURSIVE
      |it AS (SELECT user_id, unix_micros(CAST(ts AS TIMESTAMP)) AS tus, event_id,
      |       CAST(get_json_object(props, '$.k') AS BIGINT) AS item FROM events),
      |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src FROM it),
      |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
      |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
      |tot AS (SELECT SUM(w) AS s, COUNT(*) AS c FROM edges),
      |se AS (SELECT e.src, e.dst FROM edges e CROSS JOIN tot t WHERE 2 * e.w * t.c > 3 * t.s),
      |reach(node, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      |  UNION ALL
      |  SELECT se.dst, r.depth + 1 FROM reach r JOIN se ON se.src = r.node WHERE r.depth < 6
      |)
      |SELECT node, CAST(MIN(depth) AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_paths
      |FROM reach GROUP BY node ORDER BY node""".stripMargin
    val t0 = System.nanoTime()
    val df = spark.sql(q)
    val rows = df.collect()
    println(f"rows=${rows.length} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    rows.take(5).foreach(println)
    df.explain("formatted")
    spark.stop()
  }
}
