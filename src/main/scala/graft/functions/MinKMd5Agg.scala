package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The k lexicographically smallest DISTINCT md5 hex digests of the
  * group's values, ascending — the document-fingerprint selection of
  * `TextAnalysis.fingerprint` (sort_array(collect_list(md5))[1:3]) as one
  * bounded-state aggregate.
  *
  * Equivalent declarative plan: distinct (doc, shingle) exchange + md5
  * projection + collect_list shuffle of EVERY digest + per-group sort.
  * Here the buffer holds at most k 16-byte digests (lexicographic hex
  * order of fixed-width lowercase hex == unsigned byte order of the raw
  * digest, so digests are kept raw and rendered once per group in eval);
  * duplicate digests are dropped at insert, so the input needs NO distinct
  * pre-pass, and map-side partial aggregation caps shuffle traffic at k
  * digests per (group, partition) — the property that keeps a 100 TB
  * fingerprint pass one small shuffle.
  */
case class MinKMd5Aggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[Array[Byte]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.ArrayList[Array[Byte]] =
    new java.util.ArrayList[Array[Byte]](k)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Insert digest into the sorted ≤k buffer unless duplicate or too large. */
  private def insert(buf: java.util.ArrayList[Array[Byte]], d: Array[Byte]): Unit = {
    var lo = 0
    var hi = buf.size()
    while (lo < hi) { // binary search over ≤k entries
      val mid = (lo + hi) >>> 1
      val c = compareBytes(d, buf.get(mid))
      if (c == 0) return // distinct: drop duplicates
      else if (c < 0) hi = mid
      else lo = mid + 1
    }
    if (lo < k) {
      buf.add(lo, d)
      if (buf.size() > k) buf.remove(k)
    }
  }

  override def update(buf: java.util.ArrayList[Array[Byte]], input: InternalRow): java.util.ArrayList[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      md.reset()
      md.update(v.asInstanceOf[UTF8String].getBytes)
      insert(buf, md.digest())
    }
    buf
  }

  override def merge(b1: java.util.ArrayList[Array[Byte]], b2: java.util.ArrayList[Array[Byte]]): java.util.ArrayList[Array[Byte]] = {
    var i = 0
    while (i < b2.size()) { insert(b1, b2.get(i)); i += 1 }
    b1
  }

  private val hexChars = "0123456789abcdef".toCharArray

  override def eval(buf: java.util.ArrayList[Array[Byte]]): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size()) { i =>
      val d = buf.get(i)
      val out = new Array[Char](32)
      var j = 0
      while (j < 16) {
        out(2 * j) = hexChars((d(j) >> 4) & 0xf)
        out(2 * j + 1) = hexChars(d(j) & 0xf)
        j += 1
      }
      UTF8String.fromString(new String(out))
    })

  override def serialize(buf: java.util.ArrayList[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size()) // full int: k > 127 must survive the shuffle
    var i = 0
    while (i < buf.size()) { out.write(buf.get(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.ArrayList[Array[Byte]](k)
    var i = 0
    while (i < n) {
      val d = new Array[Byte](16)
      in.readFully(d)
      buf.add(d)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKMd5Aggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKMd5Aggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinKMd5Aggregate {
  /** Column API: min_k_md5(value, k) → ARRAY<STRING> of the k smallest
    * distinct md5 hex digests, ascending. */
  def min_k_md5(c: Column, k: Int): Column =
    GraftBridge.column(
      MinKMd5Aggregate(GraftBridge.expression(c), k).toAggregateExpression())
}
