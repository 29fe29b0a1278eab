package graft.functions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** KLL quantile sketches (Karnin–Lang–Liberty 2016, via the DataSketches
  * library on Spark's classpath) as persistable aggregate state — the
  * QUANTILE sibling of q38's HLL pattern: per-shard jobs store
  * `kll_sketch` binaries as data, and later queries roll them up with
  * `kll_est` WITHOUT re-reading raw rows. Both aggregates are mergeable
  * (map-side combine ships ≤ sketch-size bytes per partition — a few KB
  * at k=200 — regardless of row count). KLL's compaction samples
  * randomly, so unlike this repo's exact integer operators the sketch
  * bytes are NOT run-deterministic; the guarantee that IS portable is
  * the rank-error bound (±~1.65% at k=200, 99% confidence), which the
  * q26/q38-style oracle asserts per engine against exact order
  * statistics.
  */
case class KllSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KllLongsSketch, b2: KllLongsSketch): KllLongsSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge persisted KLL sketch binaries and evaluate quantile estimates at
  * the given ranks — ARRAY<BIGINT>, null for an all-null group. */
case class KllEstAggregate(
    child: Expression,
    k: Int,
    ranks: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] {
  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be within [0, 1], got $ranks")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllLongsSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllLongsSketch, b2: KllLongsSketch): KllLongsSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllLongsSketch): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(ranks.map(r => buf.getQuantile(r): Any).toArray)

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllEstAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllEstAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar: quantile estimates at `ranks` read from a persisted KLL
  * sketch binary — ARRAY<BIGINT>, null for null/empty sketches. The
  * read side of the persistence pattern (kll_sketch writes, this
  * evaluates without any aggregation). */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be within [0, 1], got $ranks")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override protected def nullSafeEval(input: Any): Any = {
    val sk = KllLongsSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(ranks.map(r => sk.getQuantile(r): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllFunctions {
  /** Column API: quantile estimates from a persisted sketch binary. */
  def kll_quantiles(c: Column, ranks: Seq[Double]): Column =
    GraftBridge.column(KllQuantiles(GraftBridge.expression(c), ranks))

  /** Column API: per-group KLL sketch binary of a BIGINT column. */
  def kll_sketch(c: Column, k: Int): Column =
    GraftBridge.column(
      KllSketchAggregate(GraftBridge.expression(c), k).toAggregateExpression())

  /** Column API: merge sketch binaries, return quantile estimates at
    * `ranks` as ARRAY<BIGINT>. */
  def kll_est(c: Column, k: Int, ranks: Seq[Double]): Column =
    GraftBridge.column(
      KllEstAggregate(GraftBridge.expression(c), k, ranks).toAggregateExpression())

  /** Arity-checked SQL builders for the serving frontends + extensions
    * hook: `kll_sketch(v, k)`, `kll_est(sk, k, r...)`,
    * `kll_quantiles(sk, r...)`, and the KMV `min_k_md5(v, k)`. */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    def litInt(e: Expression, fn: String, arg: String): Int = e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case _ => throw new IllegalArgumentException(s"$fn: $arg must be an integer literal")
    }
    def litDouble(e: Expression, fn: String): Double = e match {
      case Literal(v: Double, _) => v
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case Literal(v: Int, _) => v.toDouble
      case _ => throw new IllegalArgumentException(s"$fn: ranks must be numeric literals")
    }
    def lng(e: Expression) =
      if (e.dataType == LongType) e else Cast(e, LongType)
    Seq(
      "kll_sketch" -> { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"kll_sketch(value, k) takes 2 arguments, got ${es.length}")
        KllSketchAggregate(lng(es(0)), litInt(es(1), "kll_sketch", "k")).toAggregateExpression()
      },
      "kll_est" -> { es =>
        if (es.length < 3) throw new IllegalArgumentException(
          s"kll_est(sketch, k, rank...) takes >= 3 arguments, got ${es.length}")
        KllEstAggregate(es(0), litInt(es(1), "kll_est", "k"),
          es.drop(2).map(litDouble(_, "kll_est"))).toAggregateExpression()
      },
      "kll_quantiles" -> { es =>
        if (es.length < 2) throw new IllegalArgumentException(
          s"kll_quantiles(sketch, rank...) takes >= 2 arguments, got ${es.length}")
        KllQuantiles(es(0), es.drop(1).map(litDouble(_, "kll_quantiles")))
      },
      "min_k_md5" -> { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"min_k_md5(value, k) takes 2 arguments, got ${es.length}")
        MinKMd5Aggregate(
          if (es(0).dataType == org.apache.spark.sql.types.StringType) es(0)
          else Cast(es(0), org.apache.spark.sql.types.StringType),
          litInt(es(1), "min_k_md5", "k")).toAggregateExpression()
      })
  }
}
