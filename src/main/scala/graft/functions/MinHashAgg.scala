package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All-k minhash signature in ONE aggregate: for each seed j in 0..k-1,
  * the lexicographic MIN over the group's values of the first 16 hex chars
  * of md5(j + ":" + value) — exactly the spec of
  * `TextDedup.minhashSignatures`, which previously ran as k independent
  * min(md5(...)) aggregates. One buffer of k values replaces k aggregate
  * buffers (k× fewer buffer updates and a k× smaller generated plan), and
  * the md5 of the value is computed once per (row, seed) either way.
  *
  * Internally the 16-hex-char prefix is tracked as its unsigned 64-bit
  * numeric value (the first 8 digest bytes, big-endian): lexicographic
  * order of fixed-width lowercase hex IS unsigned numeric order, so
  * Long.compareUnsigned replaces per-row hex encoding + string compares,
  * and the shuffle buffer is k longs instead of k strings. Hex rendering
  * happens once per group in eval(). Returns ARRAY<STRING> of length k.
  */
case class MinHashAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  // buffer slot k is a 0/1 "group has at least one value" flag so an
  // all-null group still evals to k nulls (parity with min(...) aggs)
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](k + 1)
    java.util.Arrays.fill(b, 0, k, -1L) // unsigned max
    b
  }

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val digestBuf = new Array[Byte](16)
  // "<j>:" prefixes pre-encoded once
  @transient private lazy val seedPrefix: Array[Array[Byte]] =
    Array.tabulate(k)(j => (j.toString + ":").getBytes(UTF_8))

  private def hash64(j: Int, s: Array[Byte]): Long = {
    md.reset()
    md.update(seedPrefix(j))
    md.update(s)
    md.digest(digestBuf, 0, 16)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digestBuf(i) & 0xffL); i += 1 }
    h
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var j = 0
      while (j < k) {
        val h = hash64(j, bytes)
        if (java.lang.Long.compareUnsigned(h, buffer(j)) < 0) buffer(j) = h
        j += 1
      }
      buffer(k) = 1L
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (java.lang.Long.compareUnsigned(b2(j), b1(j)) < 0) b1(j) = b2(j)
      j += 1
    }
    b1(k) |= b2(k)
    b1
  }

  private val hexChars = "0123456789abcdef".toCharArray

  override def eval(buffer: Array[Long]): Any =
    if (buffer(k) == 0L) new GenericArrayData(Array.fill[AnyRef](k)(null))
    else new GenericArrayData(Array.tabulate[Any](k) { j =>
      val h = buffer(j)
      val out = new Array[Char](16)
      var i = 0
      while (i < 16) { out(i) = hexChars(((h >>> ((15 - i) * 4)) & 0xf).toInt); i += 1 }
      UTF8String.fromString(new String(out))
    })

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream((k + 1) * 8)
    val out = new DataOutputStream(bos)
    buffer.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(k + 1)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAggregate {
  /** Column API: minhash_sig(value, k) → ARRAY<STRING>(k). */
  def minhash_sig(c: Column, k: Int): Column =
    GraftBridge.column(
      MinHashAggregate(GraftBridge.expression(c), k).toAggregateExpression())
}
