package graft.functions.wasm

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4, UDF5}
import org.apache.spark.sql.types._

import MsgPack._

/** CREATE FUNCTION ... language 'wasmMessagePack' execution (reference
  * `src/wasm_udf/wasm.rs:84-241`): the module must export `alloc`,
  * `dealloc`, `memory` and the entrypoint. Per row, the arguments are
  * msgpack-encoded as ONE array into a guest buffer laid out as
  * [i32 little-endian payload size][payload], allocated via
  * `alloc(size)`; the entrypoint receives the buffer pointer and returns
  * a pointer to an identically-framed result buffer; both buffers are
  * released with `dealloc(ptr, size)` after the result is decoded.
  *
  * Type map (reference `src/wasm_udf/wasm.rs:39-65`): beyond the raw-ABI
  * numerics this adds TEXT (str), BOOLEAN (bool), DATE (int32 epoch
  * days), TIMESTAMP (int64 epoch NANOseconds — Spark's µs are scaled at
  * the boundary), and DECIMAL(p,s) (array [p, s, high64, low64] of the
  * scaled i128, low half truncated signed, high half arithmetic-shifted —
  * mirrored bit-for-bit).
  *
  * Each executor thread keeps one instance (the guest allocator is
  * mutable state); after a trap the instance is discarded so a panicked
  * allocator can't poison later rows (the reference re-instantiates per
  * batch for the same reason).
  */
object WasmMsgPackUdf {

  // --- declared-type model ----------------------------------------------

  private[wasm] sealed trait MpType { def dataType: DataType }
  private case object TSmallInt extends MpType { val dataType: DataType = ShortType }
  private case object TInt extends MpType { val dataType: DataType = IntegerType }
  private case object TBigInt extends MpType { val dataType: DataType = LongType }
  private case object TF32 extends MpType { val dataType: DataType = FloatType }
  private case object TF64 extends MpType { val dataType: DataType = DoubleType }
  private case object TText extends MpType { val dataType: DataType = StringType }
  private case object TBool extends MpType { val dataType: DataType = BooleanType }
  private case object TDate extends MpType { val dataType: DataType = DateType }
  private case object TTimestamp extends MpType { val dataType: DataType = TimestampType }
  private case class TDecimal(p: Int, s: Int) extends MpType {
    val dataType: DataType = DecimalType(p, s)
  }

  private val DecimalRe = """(?i)\s*(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(-?\d+)\s*\)\s*""".r

  private def mpType(t: String): MpType = t.trim.toLowerCase match {
    case "i32" | "int" | "integer" | "int4" => TInt
    case "smallint" | "int2" => TSmallInt
    case "i64" | "bigint" | "int8" => TBigInt
    case "f32" | "float" | "real" | "float4" => TF32
    case "f64" | "double" | "float8" => TF64
    case "text" | "char" | "varchar" | "string" => TText
    case "boolean" | "bool" => TBool
    case "date" => TDate
    case "timestamp" => TTimestamp
    case DecimalRe(p, s) => TDecimal(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(
      s"UDFs with language 'wasmMessagePack' do not support data type $other")
  }

  // --- JVM value <-> msgpack value per declared type ----------------------

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def encodeArg(t: MpType, v: AnyRef): Value = t match {
    case TSmallInt | TInt | TBigInt => VInt(v.asInstanceOf[Number].longValue)
    case TF32 => VF32(v.asInstanceOf[Number].floatValue)
    case TF64 => VF64(v.asInstanceOf[Number].doubleValue)
    case TText => VStr(v.toString)
    case TBool => VBool(v.asInstanceOf[java.lang.Boolean].booleanValue)
    case TDate => v match {
      case d: java.sql.Date => VInt(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => VInt(d.toEpochDay)
      case other => fail(s"cannot encode ${other.getClass.getName} as DATE")
    }
    case TTimestamp => v match {
      case ts: java.sql.Timestamp =>
        VInt(Math.floorDiv(ts.getTime, 1000L) * 1000000000L + ts.getNanos)
      case i: java.time.Instant =>
        VInt(i.getEpochSecond * 1000000000L + i.getNano)
      case other => fail(s"cannot encode ${other.getClass.getName} as TIMESTAMP")
    }
    case TDecimal(p, s) =>
      val bd = v match {
        case b: JBigDecimal => b
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case other => fail(s"cannot encode ${other.getClass.getName} as DECIMAL($p,$s)")
      }
      val scaled =
        try bd.setScale(s)
        catch {
          case _: ArithmeticException =>
            fail(s"decimal value $bd does not fit scale $s")
        }
      val unscaled = scaled.unscaledValue()
      // mirror the reference exactly: low = truncating signed 64, high =
      // arithmetic >> 64 (src/wasm_udf/wasm.rs:333-343)
      VArr(Vector(VInt(p.toLong), VInt(s.toLong),
        VInt(unscaled.shiftRight(64).longValue()), VInt(unscaled.longValue())))
  }

  private def asI64(v: Value, what: String): Long = v match {
    case VInt(i) => i
    case other => fail(s"Expected to find $what value, but received ${describe(other)} instead")
  }

  private def decodeResult(t: MpType, v: Value): AnyRef = t match {
    case TSmallInt =>
      val i = asI64(v, "i64")
      if (i < Short.MinValue || i > Short.MaxValue) fail(s"Error converting i64 to i16: $i out of range")
      java.lang.Short.valueOf(i.toShort)
    case TInt =>
      val i = asI64(v, "i64")
      if (i < Int.MinValue || i > Int.MaxValue) fail(s"Error converting i64 to i32: $i out of range")
      java.lang.Integer.valueOf(i.toInt)
    case TBigInt => java.lang.Long.valueOf(asI64(v, "i64"))
    case TText => v match {
      case VStr(s) => s
      case other => fail(s"Expected to find string value, received ${describe(other)} instead")
    }
    case TBool => v match {
      case VBool(b) => java.lang.Boolean.valueOf(b)
      case other => fail(s"Expected to find boolean value, received ${describe(other)} instead")
    }
    case TF64 => v match { // rmpv as_f64 accepts either float width
      case VF64(d) => java.lang.Double.valueOf(d)
      case VF32(f) => java.lang.Double.valueOf(f.toDouble)
      case other => fail(s"Expected to find f64 value, but received ${describe(other)} instead")
    }
    case TF32 => v match { // the reference is strict here: F32 only
      case VF32(f) => java.lang.Float.valueOf(f)
      case other => fail(s"Expected to find f32 value, but received ${describe(other)} instead")
    }
    case TDate =>
      val i = asI64(v, "i64")
      if (i < Int.MinValue || i > Int.MaxValue) fail(s"Error converting i64 to i32 (for date): $i out of range")
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i))
    case TTimestamp =>
      val ns = asI64(v, "i64")
      val ts = new java.sql.Timestamp(Math.floorDiv(ns, 1000000000L) * 1000L)
      ts.setNanos(Math.floorMod(ns, 1000000000L).toInt)
      ts
    case TDecimal(p, s) => v match {
      case VArr(Vector(pv, sv, hv, lv)) =>
        val gotP = asI64(pv, "u64")
        if (gotP != p) fail(s"Expected to receive a decimal with precision $p, got $gotP instead.")
        val gotS = asI64(sv, "u64")
        if (gotS != s) fail(s"Expected to receive a decimal with scale $s, got $gotS instead.")
        val high = asI64(hv, "i64")
        val low = asI64(lv, "i64")
        // two's-complement reconstruction: low is the UNSIGNED low half of
        // the truncating split both the host encode (wasm.rs:333-343) and
        // any natural guest produce. (The reference decode at wasm.rs:524
        // sign-extends low instead, which corrupts negatives with low < 0;
        // its own tests only cover positive decimals. We deviate to the
        // consistent reconstruction, which matches every reference test
        // vector AND round-trips negatives.)
        val mask64 = BigInteger.ONE.shiftLeft(64).subtract(BigInteger.ONE)
        val unscaled = BigInteger.valueOf(high).shiftLeft(64)
          .add(BigInteger.valueOf(low).and(mask64))
        new JBigDecimal(unscaled, s)
      case VArr(xs) => fail(s"DECIMAL UDF result array should have 4 elements, found ${xs.size} instead.")
      case other => fail(s"Expected to find array containing decimal parts, received ${describe(other)} instead")
    }
  }

  // --- per-thread instance + the buffer protocol ---------------------------

  // `bytes` MUST be a real field (`val`): referenced only from @transient
  // lazy initializers it would be nulled out by the compiler once
  // validate() forces them on the driver, serializing null to executors
  private class Callable(val bytes: Array[Byte], entry: String,
                         inTypes: Seq[MpType], outType: MpType) extends Serializable {
    @transient private lazy val module: Wasm.Module = WasmUdf.moduleFor(bytes)
    @transient private lazy val entryIdx: Int = module.exportedFunc(entry)
    @transient private lazy val allocIdx: Int = module.exportedFunc("alloc")
    @transient private lazy val deallocIdx: Int = module.exportedFunc("dealloc")
    @transient private lazy val inst = new ThreadLocal[Wasm.Instance] {
      override def initialValue(): Wasm.Instance = new Wasm.Instance(module)
    }

    /** Eager validation at CREATE FUNCTION time. */
    def validate(): Unit = {
      entryIdx; allocIdx; deallocIdx
      if (!module.exports.get("memory").exists(_._1 == 2))
        fail("could not find module's exported memory")
      val ft = module.funcType(entryIdx)
      if (ft.params.size != 1 || ft.results.size != 1)
        fail(s"WASM msgpack entrypoint '$entry' must be (i32) -> (i32)")
    }

    def call(args: Array[AnyRef]): AnyRef = {
      if (args.exists(_ == null)) return null
      val in = inst.get()
      try {
        val payload = MsgPack.encode(
          VArr(args.iterator.zipWithIndex.map { case (a, i) => encodeArg(inTypes(i), a) }.toVector))
        val inSize = payload.length + 4
        val inPtr = in.invoke(allocIdx, Array(inSize.toLong)).toInt
        in.writeI32(inPtr, payload.length)
        in.writeMemory(inPtr + 4, payload)
        val outPtr = in.invoke(entryIdx, Array(inPtr.toLong)).toInt
        val outLen = in.readI32(outPtr)
        if (outLen < 0) fail(s"Error reading UDF output buffer size: $outLen")
        val outBytes = in.readMemory(outPtr + 4, outLen)
        val result =
          try MsgPack.decode(outBytes)
          catch {
            case e: MsgPack.MalformedException =>
              fail(s"Error messagepack decoding output buffer: ${e.getMessage}")
          }
        in.invoke(deallocIdx, Array(inPtr.toLong, inSize.toLong))
        in.invoke(deallocIdx, Array(outPtr.toLong, (outLen + 4).toLong))
        decodeResult(outType, result)
      } catch {
        case e: Wasm.Trap =>
          // a trapped (panicked) guest may hold a poisoned allocator:
          // discard this thread's instance and re-instantiate on next use
          inst.remove()
          throw new RuntimeException(s"Error invoking WASM UDF: ${e.getMessage}")
      }
    }
  }

  /** Register `name` from persisted CREATE FUNCTION details (base64
    * module in `data`). Validates module, exports and entry signature
    * eagerly. */
  def register(spark: SparkSession, name: String, entrypoint: String,
               inputTypes: Seq[String], returnType: String, data: String): Unit = {
    val bytes =
      try java.util.Base64.getDecoder.decode(data.replaceAll("\\s", ""))
      catch {
        case _: IllegalArgumentException => throw new IllegalArgumentException(
          "function data must be the base64-encoded WASM module")
      }
    val inTypes = inputTypes.map(mpType)
    val outType = mpType(returnType)
    val c = new Callable(bytes, entrypoint, inTypes, outType)
    c.validate()
    val dt = outType.dataType
    inTypes.size match {
      case 0 => spark.udf.register(name, new UDF0[AnyRef] {
        def call(): AnyRef = c.call(Array.empty) }.asInstanceOf[UDF0[Any]], dt)
      case 1 => spark.udf.register(name, new UDF1[AnyRef, AnyRef] {
        def call(a: AnyRef): AnyRef = c.call(Array(a)) }.asInstanceOf[UDF1[Any, Any]], dt)
      case 2 => spark.udf.register(name, new UDF2[AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef): AnyRef = c.call(Array(a, b)) }.asInstanceOf[UDF2[Any, Any, Any]], dt)
      case 3 => spark.udf.register(name, new UDF3[AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef): AnyRef = c.call(Array(a, b, d)) }.asInstanceOf[UDF3[Any, Any, Any, Any]], dt)
      case 4 => spark.udf.register(name, new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef): AnyRef = c.call(Array(a, b, d, e)) }.asInstanceOf[UDF4[Any, Any, Any, Any, Any]], dt)
      case 5 => spark.udf.register(name, new UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef, g: AnyRef): AnyRef =
          c.call(Array(a, b, d, e, g)) }.asInstanceOf[UDF5[Any, Any, Any, Any, Any, Any]], dt)
      case n => throw new IllegalArgumentException(s"WASM UDFs support at most 5 arguments, got $n")
    }
  }
}
