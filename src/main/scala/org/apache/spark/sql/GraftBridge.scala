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
