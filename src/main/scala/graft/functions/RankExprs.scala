package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Slice id for `ops.DistributedRank`: the count of plan-baked boundary
  * tuples at-or-before the current row in the (children, ascending)
  * sort order — i.e. a contiguous range-partition id, evaluated as a
  * BINARY SEARCH over the baked boundaries.
  *
  * Why not a CASE-WHEN tree over boundary literals: 63 boundaries × a
  * multi-column lexicographic comparison each compose a generated
  * method far past HotSpot's huge-method JIT limit, so the projection
  * runs as interpreted bytecode — measured 16+ s of a 20 s q46 at sf1.
  * This expression does ⌈log₂ 64⌉ field-compare loops per row in one
  * small JIT-friendly method; its doGenCode stays INSIDE whole-stage
  * codegen (children evaluated in-line, values boxed into one Object[]
  * and passed to the baked search). q46 sf1 scale path, bench
  * conditions: 20.6 s (CASE tree) → 12.5 s (CodegenFallback draft) →
  * 11.9 s (this doGenCode); warm in-session the rank machinery runs
  * ~4.6 s vs textbook's 3-task ~5.5 s at sf1, and the gap widens with
  * every further scale-up (textbook parallelism = key cardinality).
  *
  * The boundary list is re-sorted HERE, with exactly the comparator
  * `eval` uses (UTF8String binary order for strings — not the driver's
  * UTF-16 `String.compareTo`, which can disagree on non-ASCII). Binary
  * search requires the array sorted under the probe's own order;
  * sorting internally makes the pair self-consistent by construction,
  * so the monotone-indicator invariant (slices = contiguous ranges of
  * the sort order) holds for every input, not just ASCII.
  *
  * `boundaries` holds EXTERNAL row values (what `df.rdd.collect` gives
  * the driver); they are converted to Catalyst internal values once at
  * construction. IndexedSeq fields keep case-class equality structural
  * so CSE/ReuseExchange see identical bakes as equal.
  */
case class BoundaryBucket(
    children: Seq[Expression],
    boundaries: IndexedSeq[IndexedSeq[Any]],
    ascending: IndexedSeq[Boolean])
  extends Expression {

  require(children.nonEmpty && ascending.length == children.length)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // external → internal (String → UTF8String, Timestamp → micros, ...),
  // then sorted under OUR comparator (see scaladoc)
  @transient private lazy val sortedBoundaries: Array[Array[Any]] = {
    val convs = children.map(c =>
      CatalystTypeConverters.createToCatalystConverter(c.dataType)).toArray
    val conv = boundaries.map(b =>
      Array.tabulate(b.length)(i => convs(i)(b(i)))).toArray
    java.util.Arrays.sort(conv, (a: Array[Any], b: Array[Any]) => compareRows(a, b))
    conv
  }

  /** Lexicographic compare of two internal-value tuples: ASC NULLS
    * FIRST / DESC NULLS LAST (the engine's window defaults — identical
    * to ops.DistributedRank's driver-side tupleOrdering semantics). */
  private def compareRows(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val x = a(i)
      val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else x.asInstanceOf[Comparable[Any]].compareTo(y)
      val d = if (ascending(i)) c else -c
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** First index whose boundary the key strictly precedes = the count
    * of boundaries at-or-before the key (the slice id). Public so the
    * generated code can call it on the baked reference object. */
  def bucketOf(key: Array[Any]): Long = {
    val bs = sortedBoundaries
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compareRows(key, bs(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo.toLong
  }

  override def eval(input: InternalRow): Any = {
    val key = new Array[Any](children.length)
    var i = 0
    while (i < key.length) { key(i) = children(i).eval(input); i += 1 }
    bucketOf(key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("boundaryBucket", this, classOf[BoundaryBucket].getName)
    val gens = children.map(_.genCode(ctx))
    val key = ctx.freshName("bbKey")
    val assigns = gens.zipWithIndex.map { case (g, i) =>
      s"$key[$i] = ${g.isNull} ? null : (Object) ${g.value};"
    }.mkString("\n")
    val evalChildren = gens.map(_.code).foldLeft(code"")(_ + _)
    ev.copy(
      code = evalChildren + code"""
        |Object[] $key = new Object[${children.length}];
        |$assigns
        |long ${ev.value} = $ref.bucketOf($key);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object RankExprs {
  /** See BoundaryBucket. `boundaries` are external driver rows of the
    * same arity/types as `cols`. */
  def boundary_bucket(cols: Seq[Column], boundaries: Seq[org.apache.spark.sql.Row],
                      ascending: Seq[Boolean]): Column =
    GraftBridge.column(BoundaryBucket(
      cols.map(GraftBridge.expression).toIndexedSeq,
      boundaries.map(r => r.toSeq.toIndexedSeq).toIndexedSeq,
      ascending.toIndexedSeq))
}
