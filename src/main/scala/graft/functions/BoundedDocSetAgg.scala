package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distinct (id, payload) pairs of a group, collected only UP TO a bound:
  * once the group has seen more than `cap` distinct ids the buffer stops
  * growing (it keeps cap+1 entries as the over-cap proof) and the group
  * evaluates to an over-cap marker the caller filters out.
  *
  * This is the inverted-index builder for df-capped shingle pipelines
  * (TextDedup.jaccardPairs): "collect the docs per shingle, unless the
  * shingle occurs in more than `cap` docs — then drop it as a
  * stop-shingle". A plain collect_set + post-filter has UNBOUNDED state
  * on hot keys (a boilerplate shingle present in millions of documents
  * collects millions of ids before the filter sees it); a separate
  * count pre-pass + anti-join bounds state but costs an extra shuffle
  * stage over the full shingle set. This aggregate gives the pre-pass
  * semantics in the collect pass itself: per-(key, partition) partial
  * state and shuffle traffic are both ≤ cap+1 entries, because distinct
  * counts only grow under union so an over-cap partial stays over-cap.
  *
  * Ids must be distinct per (group, payload): the payload (e.g. the
  * document's shingle-set size) rides along with its id.
  */
case class BoundedDocSetAggregate(
    id: Expression,
    payload: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def children: Seq[Expression] = Seq(id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("sz", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, java.lang.Long] =
    new java.util.HashMap[java.lang.Long, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    if (buf.size() <= cap) { // cap+1 entries prove over-cap; stop growing
      val i = id.eval(input)
      val p = payload.eval(input)
      if (i != null && p != null)
        buf.put(i.asInstanceOf[Long], p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[java.lang.Long, java.lang.Long],
      b2: java.util.HashMap[java.lang.Long, java.lang.Long]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext && b1.size() <= cap) {
      val e = it.next()
      b1.put(e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue.longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue()); out.writeLong(e.getValue.longValue())
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[java.lang.Long, java.lang.Long](n * 2)
    var i = 0
    while (i < n) { buf.put(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDocSetAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDocSetAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), payload = newChildren(1))
}

object BoundedDocSetAggregate {
  /** Column API: bounded_doc_set(id, payload, cap) → ARRAY<STRUCT<id,sz>>
    * with > cap distinct ids collapsing to a cap+1-sized over-cap marker
    * (filter `size(...) <= cap` downstream). Both inputs must be LONG. */
  def bounded_doc_set(id: Column, payload: Column, cap: Int): Column =
    GraftBridge.column(
      BoundedDocSetAggregate(
        GraftBridge.expression(id), GraftBridge.expression(payload), cap)
        .toAggregateExpression())
}
