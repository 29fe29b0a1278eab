package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expression for the Int64 dot product of two BIGINT
  * arrays — the hot inner loop of every embedding-similarity operator.
  *
  * Why not `aggregate(zip_with(a, b, (x, y) -> x*y), ...)`: Spark's
  * higher-order functions evaluate their lambdas interpreted (one closure
  * dispatch + boxing per element), which costs ~5-10× on a 64-dim dot.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen. Semantics are identical (exact Int64 arithmetic, order-free),
  * so the DuckDB oracles are unaffected.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(LongType, false) || left.dataType == ArrayType(LongType, true)) {
      if (right.dataType == ArrayType(LongType, false) || right.dataType == ArrayType(LongType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right side must be ARRAY<BIGINT>, got ${right.dataType.sql}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left side must be ARRAY<BIGINT>, got ${left.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for DotProductLong. */
  def dot_q(a: Column, b: Column): Column =
    GraftBridge.column(DotProductLong(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register `dot_q` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_q", exprs => DotProductLong(exprs(0), exprs(1)), "scala_udf")
}
