package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `new Column(expr)` private to
  * the sql package (columns are plan-node-based in the unified API); the
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]` — this shim re-exports it for graft's custom Catalyst
  * expressions (the standard extension-library technique).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** DataFrame construction over a custom FileIndex (manifest-backed scans).
  * HadoopFsRelation/LogicalRelation/Dataset.ofRows live behind package-
  * private seams in Spark 4; this shim assembles the standard
  * "external lakehouse table" relation exactly the way delta-spark does.
  */
object GraftRelations {
  import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
  import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
  import org.apache.spark.sql.types.StructType

  def parquetScan(spark: SparkSession, index: FileIndex, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rel = HadoopFsRelation(index, StructType(Nil), schema, None,
      new ParquetFileFormat, Map.empty[String, String])(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(rel, isStreaming = false))
  }
}
