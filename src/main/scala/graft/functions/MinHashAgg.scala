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
  * min(md5(...)) aggregates. One buffer of k strings replaces k aggregate
  * buffers (k× fewer buffer updates and a k× smaller generated plan), and
  * the md5 of the value is computed once per (row, seed) either way.
  * Returns ARRAY<STRING> of length k.
  */
case class MinHashAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def createAggregationBuffer(): Array[String] = Array.fill[String](k)(null)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  private def hashPrefix(j: Int, s: String): String = {
    md.reset()
    val digest = md.digest((j.toString + ":" + s).getBytes(UTF_8))
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(i * 2) = hexChars((digest(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(digest(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def update(buffer: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var j = 0
      while (j < k) {
        val h = hashPrefix(j, s)
        if (buffer(j) == null || h.compareTo(buffer(j)) < 0) buffer(j) = h
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var j = 0
    while (j < k) {
      if (b1(j) == null || (b2(j) != null && b2(j).compareTo(b1(j)) < 0)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buffer: Array[String]): Any =
    new GenericArrayData(buffer.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buffer: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buffer.foreach { s =>
      if (s == null) out.writeBoolean(false)
      else { out.writeBoolean(true); out.writeUTF(s) }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(k)(if (in.readBoolean()) in.readUTF() else null)
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
