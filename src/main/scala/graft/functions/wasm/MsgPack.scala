package graft.functions.wasm

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal MessagePack codec for the wasmMessagePack UDF ABI (reference
  * `src/wasm_udf/wasm.rs:84-241`, which speaks rmp-serde/rmpv). Encoding
  * follows rmp's canonical minimal-width choices: non-negative integers
  * use the uint family, negative the int family; strings are UTF-8 str;
  * the argument list is one array. Decoding accepts the full scalar/
  * array/map surface and fails loudly on truncated or unknown bytes
  * (mirroring the reference's "Error messagepack decoding output buffer"
  * path).
  */
object MsgPack {

  sealed trait Value
  case object VNil extends Value
  final case class VBool(b: Boolean) extends Value
  /** Signed integer (int family or uint ≤ Long.MaxValue). */
  final case class VInt(v: Long) extends Value
  /** uint64 above Long.MaxValue: raw bits kept; never converts to i64. */
  final case class VBigUInt(bits: Long) extends Value
  final case class VF32(f: Float) extends Value
  final case class VF64(d: Double) extends Value
  final case class VStr(s: String) extends Value
  final case class VBin(b: Array[Byte]) extends Value
  final case class VArr(xs: Vector[Value]) extends Value
  final case class VMap(xs: Vector[(Value, Value)]) extends Value

  /** Human-readable rendering for error messages (reference style:
    * "received Integer(PosInt(3)) instead"). */
  def describe(v: Value): String = v match {
    case VNil => "Nil"
    case VBool(b) => s"Boolean($b)"
    case VInt(i) => if (i >= 0) s"Integer(PosInt($i))" else s"Integer(NegInt($i))"
    case VBigUInt(b) => s"Integer(PosInt(${java.lang.Long.toUnsignedString(b)}))"
    case VF32(f) => s"F32($f)"
    case VF64(d) => s"F64($d)"
    case VStr(s) => s"""String(Utf8String { s: Ok("$s") })"""
    case VBin(b) => s"Binary(${b.length} bytes)"
    case VArr(xs) => s"Array(${xs.size})"
    case VMap(xs) => s"Map(${xs.size})"
  }

  class MalformedException(msg: String) extends RuntimeException(msg)

  // --- encode ---------------------------------------------------------------

  def encode(v: Value): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    write(v, out)
    out.toByteArray
  }

  private def write(v: Value, out: ByteArrayOutputStream): Unit = v match {
    case VNil => out.write(0xc0)
    case VBool(b) => out.write(if (b) 0xc3 else 0xc2)
    case VInt(i) if i >= 0 => // uint family (rmp write_sint semantics)
      if (i <= 0x7f) out.write(i.toInt)
      else if (i <= 0xff) { out.write(0xcc); out.write(i.toInt) }
      else if (i <= 0xffff) { out.write(0xcd); be(out, i, 2) }
      else if (i <= 0xffffffffL) { out.write(0xce); be(out, i, 4) }
      else { out.write(0xcf); be(out, i, 8) }
    case VInt(i) => // negative: int family
      if (i >= -32) out.write(0xe0 | (i.toInt & 0x1f))
      else if (i >= Byte.MinValue) { out.write(0xd0); out.write(i.toInt & 0xff) }
      else if (i >= Short.MinValue) { out.write(0xd1); be(out, i, 2) }
      else if (i >= Int.MinValue) { out.write(0xd2); be(out, i, 4) }
      else { out.write(0xd3); be(out, i, 8) }
    case VBigUInt(bits) => out.write(0xcf); be(out, bits, 8)
    case VF32(f) => out.write(0xca); be(out, java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL, 4)
    case VF64(d) => out.write(0xcb); be(out, java.lang.Double.doubleToLongBits(d), 8)
    case VStr(s) =>
      val b = s.getBytes(UTF_8)
      if (b.length <= 31) out.write(0xa0 | b.length)
      else if (b.length <= 0xff) { out.write(0xd9); out.write(b.length) }
      else if (b.length <= 0xffff) { out.write(0xda); be(out, b.length.toLong, 2) }
      else { out.write(0xdb); be(out, b.length.toLong, 4) }
      out.write(b, 0, b.length)
    case VBin(b) =>
      if (b.length <= 0xff) { out.write(0xc4); out.write(b.length) }
      else if (b.length <= 0xffff) { out.write(0xc5); be(out, b.length.toLong, 2) }
      else { out.write(0xc6); be(out, b.length.toLong, 4) }
      out.write(b, 0, b.length)
    case VArr(xs) =>
      if (xs.size <= 15) out.write(0x90 | xs.size)
      else if (xs.size <= 0xffff) { out.write(0xdc); be(out, xs.size.toLong, 2) }
      else { out.write(0xdd); be(out, xs.size.toLong, 4) }
      xs.foreach(write(_, out))
    case VMap(xs) =>
      if (xs.size <= 15) out.write(0x80 | xs.size)
      else if (xs.size <= 0xffff) { out.write(0xde); be(out, xs.size.toLong, 2) }
      else { out.write(0xdf); be(out, xs.size.toLong, 4) }
      xs.foreach { case (k, v2) => write(k, out); write(v2, out) }
  }

  private def be(out: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  // --- decode ---------------------------------------------------------------

  /** Decode ONE value from `buf`; trailing bytes are ignored (the ABI's
    * buffers hold exactly one value, length-prefixed). */
  def decode(buf: Array[Byte]): Value = new Dec(buf).value()

  private final class Dec(buf: Array[Byte]) {
    private var pos = 0
    private def u8(): Int = {
      if (pos >= buf.length) throw new MalformedException("truncated messagepack value")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    private def beN(n: Int): Long = {
      if (pos + n > buf.length) throw new MalformedException("truncated messagepack value")
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }
      pos += n; v
    }
    private def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > buf.length) throw new MalformedException("truncated messagepack value")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; r
    }
    def value(): Value = {
      val t = u8()
      if (t <= 0x7f) VInt(t.toLong)
      else if (t >= 0xe0) VInt((t - 256).toLong)
      else if ((t & 0xf0) == 0x90) arr(t & 0x0f)
      else if ((t & 0xf0) == 0x80) map(t & 0x0f)
      else if ((t & 0xe0) == 0xa0) VStr(new String(bytes(t & 0x1f), UTF_8))
      else t match {
        case 0xc0 => VNil
        case 0xc2 => VBool(false)
        case 0xc3 => VBool(true)
        case 0xc4 => VBin(bytes(beN(1).toInt))
        case 0xc5 => VBin(bytes(beN(2).toInt))
        case 0xc6 => VBin(bytes(beN(4).toInt))
        case 0xca => VF32(java.lang.Float.intBitsToFloat(beN(4).toInt))
        case 0xcb => VF64(java.lang.Double.longBitsToDouble(beN(8)))
        case 0xcc => VInt(beN(1))
        case 0xcd => VInt(beN(2))
        case 0xce => VInt(beN(4))
        case 0xcf => val v = beN(8); if (v >= 0) VInt(v) else VBigUInt(v)
        case 0xd0 => VInt(beN(1).toByte.toLong)
        case 0xd1 => VInt(beN(2).toShort.toLong)
        case 0xd2 => VInt(beN(4).toInt.toLong)
        case 0xd3 => VInt(beN(8))
        case 0xd9 => VStr(new String(bytes(beN(1).toInt), UTF_8))
        case 0xda => VStr(new String(bytes(beN(2).toInt), UTF_8))
        case 0xdb => VStr(new String(bytes(beN(4).toInt), UTF_8))
        case 0xdc => arr(beN(2).toInt)
        case 0xdd => arr(beN(4).toInt)
        case 0xde => map(beN(2).toInt)
        case 0xdf => map(beN(4).toInt)
        case other => throw new MalformedException(
          f"unsupported messagepack type byte 0x$other%02x")
      }
    }
    private def arr(n: Int): VArr = {
      // arr32/map32 lengths >= 2^31 arrive negative after .toInt; without
      // this check Vector.fill(negative) silently yields an EMPTY value
      // instead of failing loudly on the malformed buffer
      if (n < 0) throw new MalformedException(s"invalid container length $n")
      VArr(Vector.fill(n)(value()))
    }
    private def map(n: Int): VMap = {
      if (n < 0) throw new MalformedException(s"invalid container length $n")
      VMap(Vector.fill(n)((value(), value())))
    }
  }
}
