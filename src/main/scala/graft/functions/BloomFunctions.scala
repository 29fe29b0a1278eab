package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column + SQL surface over Spark's internal bloom-filter expressions
  * (the machinery behind InjectRuntimeFilter, not exposed in the public
  * function registry): `bloom_filter_agg` builds a sketch over a LONG
  * column, `might_contain` probes it in-row. Used by the contamination
  * screen's prefilter (build the sketch over the SMALL side, drop the
  * big side's rows before they reach any exchange) and registered for
  * SQL on both serving frontends.
  */
object BloomFunctions {

  /** Aggregate a bloom sketch over a LONG column (e.g. xxhash64 output).
    * Sketch size follows Spark's sizing for `estItems` (~8 bits/item). */
  def bloom_filter_agg(c: Column, estItems: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(GraftBridge.expression(c), estItems)
      .toAggregateExpression())

  /** In-row membership probe; `bloom` must fold to a constant (a baked
    * literal or scalar subquery — the sketch, never data, moves). */
  def might_contain(bloom: Column, v: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(v)))

  /** Arity-checked SQL builders for the serving frontends. */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_filter_agg" -> { es =>
      es.length match {
        case 1 => new BloomFilterAggregate(es(0)).toAggregateExpression()
        case 2 => new BloomFilterAggregate(es(0), es(1)).toAggregateExpression()
        case 3 => new BloomFilterAggregate(es(0), es(1), es(2)).toAggregateExpression()
        case n => throw new IllegalArgumentException(
          s"bloom_filter_agg(value[, estNumItems[, numBits]]) takes 1-3 arguments, got $n")
      }
    },
    "might_contain" -> { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"might_contain(bloom, value) takes 2 arguments, got ${es.length}")
      BloomFilterMightContain(es(0), es(1))
    })
}
