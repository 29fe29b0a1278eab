package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Standard Spark extension entry point: enable every graft engine
  * function on ANY SparkSession — including spark-submit / spark-sql
  * sessions that never touch GraftContext — with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Injects the codegen'd `dot_q` vector expression and the
  * DataFusion-name compat aliases through the supported
  * `SparkSessionExtensions.injectFunction` hook (the same mechanism
  * delta-spark and iceberg-spark use), so no session-construction code
  * is required.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[graft.functions.DotProductLong].getName, "dot_q"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProductLong(exprs(0), exprs(1))))
    (graft.functions.TextExprs.sqlBuilders.map((_, "graft.functions.TextExprs")) ++
        graft.functions.BloomFunctions.sqlBuilders.map((_, "graft.functions.BloomFunctions")) ++
        graft.functions.KllFunctions.sqlBuilders.map((_, "graft.functions.KllFunctions")))
      .foreach { case ((name, builder), cls) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(cls, name),
          builder))
      }
  }
}
