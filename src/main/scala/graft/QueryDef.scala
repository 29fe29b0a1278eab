package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine capability: a Spark-first implementation
  * plus (when SQL-expressible) an equivalent DuckDB oracle query over the
  * same parquet tables. Column names/aliases must match between the two —
  * the driver's compare sorts columns by name before hashing.
  */
case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Non-SQL-expressible op: driver falls back to a rows-only check. */
  def unoracled(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  /** Same SQL text runs on both Spark and DuckDB (ANSI-portable subset). */
  def sharedSql(name: String, sql: String): QueryDef =
    QueryDef(name, (s, dir) => Tables.sql(s, dir, sql), Some(sql))
}
