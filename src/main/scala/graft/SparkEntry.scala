package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator's QueryDef from the query modules; each def
  * carries both the Spark-first implementation and (when SQL-expressible)
  * a DuckDB oracle for value-exact verification.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.Functions2.defs ++
      graft.queries.PipelinesDedup.defs ++
      graft.queries.Similarity.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.Events.defs ++
      graft.queries.GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
