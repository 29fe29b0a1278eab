package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: frequent items with HARD-BOUNDED state —
  * at most `capacity` (item, counter) pairs per partial, per shuffle
  * row, per final buffer, no matter how large or skewed the input. The
  * exact-top-k alternative (groupBy item) shuffles the full distinct
  * item set; at 100 TB that's the vocabulary of the web. This sketch
  * answers "every item with frequency > N/(capacity+1), with counts
  * under-estimated by at most N/(capacity+1)" out of one map-side-
  * combinable pass.
  *
  * update: the textbook decrement rule — a full summary seeing a new
  * item decrements ALL counters (dropping zeros) instead of inserting.
  * merge: counter-wise sum, then subtract the (capacity+1)-th largest
  * count from everything and drop non-positives (the mergeable-
  * summaries construction — Agarwal et al., PODS'12 — which keeps the
  * total undercount ≤ N/(capacity+1) across any merge tree).
  *
  * Estimates are merge-ORDER-dependent (any MG implementation's are),
  * so deterministic pipelines compare them against exact counts via the
  * guarantee booleans (see tx21) rather than emitting raw estimates.
  * Output: array<struct<item string, est long>>, (est desc, item asc).
  */
case class MisraGriesAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(item)
    if (cur != null) buf.put(item, cur + 1L)
    else if (buf.size() < capacity) buf.put(item, 1L)
    else {
      // full and unseen: decrement everything, drop zeros (the arriving
      // item is "cancelled" against one occurrence of every counter)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, java.lang.Long],
      b2: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (b1.size() > capacity) {
      // subtract the (capacity+1)-th largest count; > capacity entries
      // cannot all exceed it, so at most `capacity` survive
      val counts = new Array[Long](b1.size())
      var i = 0
      val cit = b1.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - capacity - 1)
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= threshold) it.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue.longValue())
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGriesAggregate {
  /** Column API: misra_gries(item, capacity) →
    * ARRAY<STRUCT<item STRING, est BIGINT>> (est DESC, item ASC). */
  def misra_gries(item: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesAggregate(GraftBridge.expression(item), capacity)
        .toAggregateExpression())
}
