package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass second-moment (Gram) accumulation over integer vectors: the
  * covariance-input pass of distributed PCA. State is FIXED-SIZE —
  * [count, Σv_i (dim), Σv_i·v_j upper triangle (dim·(dim+1)/2 longs)] —
  * per partial, per shuffle row, per final buffer: ~17 KB at dim=64
  * regardless of corpus size, map-side combinable, merge = elementwise
  * add. The alternative (explode to (i, j, v_i·v_j) rows + groupBy)
  * shuffles dim²/2 rows PER VECTOR. All arithmetic is exact Int64 on
  * scaleDiv-reduced components (pick scaleDiv so products×rows stay
  * inside 63 bits — overflow would wrap silently), making the result
  * independent of partitioning and merge order — the determinism every
  * downstream eigensolve inherits.
  *
  * Null or shorter-than-`dim` vectors are ignored (contract: validate
  * dimensionality upstream — the count slot says how many rows actually
  * contributed). Output: array<bigint> of length 1 + dim + dim·(dim+1)/2
  * in the layout above.
  */
case class GramAggregate(
    child: Expression,
    dim: Int,
    scaleDiv: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(scaleDiv >= 1, s"scaleDiv must be >= 1, got $scaleDiv")

  private val len = 1 + dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_acc"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return buf
    buf(0) += 1L
    var i = 0
    var g = 1 + dim
    while (i < dim) {
      val vi = arr.getLong(i) / scaleDiv
      buf(1 + i) += vi
      var j = i
      while (j < dim) { buf(g) += vi * (arr.getLong(j) / scaleDiv); j += 1; g += 1 }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * len)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < len) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object GramAggregate {
  /** Column API: gram_acc(vec, dim, scaleDiv) → ARRAY<BIGINT>
    * [n, sums(dim), upper-triangle gram], inputs integer-divided by
    * scaleDiv inside the update loop (pick it so products×rows fit
    * 63 bits). */
  def gram_acc(vec: Column, dim: Int, scaleDiv: Long): Column =
    GraftBridge.column(
      GramAggregate(GraftBridge.expression(vec), dim, scaleDiv).toAggregateExpression())
}
