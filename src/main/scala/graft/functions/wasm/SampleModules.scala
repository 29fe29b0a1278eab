package graft.functions.wasm

/** Hand-assembled WASM MVP sample modules: the msgpack-ABI module that
  * backs both WasmMsgPackSpec (conformance) and graft.tools.ProbeWasm
  * (throughput), plus the public sintau/exp2/log2 raw-ABI module the
  * reference's own wasm tests use (reference src/wasm_udf/wasm.rs:84-241
  * for the msgpack buffer protocol; :822-925 for the raw test module,
  * gist.github.com/going-digital/02e46c44d89237c07bc99cd440ebfa43).
  *
  * Msgpack module ABI surface.
  * Exports: `memory`, `alloc` (bump allocator from a mutable heap-top
  * global), `dealloc` (no-op), and entrypoints `rev` (reverse a string),
  * `til` (negate a bool), `addhour` (+1h on an epoch-ns i64), `ident`
  * (strip the fixarray-1 header — identity for any single argument).
  * Buffers are framed [i32 LE payload size][payload] per the reference
  * protocol; unknown encodings hit `unreachable` so host trap handling
  * is observable. */
object SampleModules {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def cat(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray

  private def uleb(n0: Long): Array[Byte] = {
    var n = n0; val out = Array.newBuilder[Byte]
    var more = true
    while (more) {
      var x = (n & 0x7f).toInt; n >>>= 7
      if (n != 0) x |= 0x80 else more = false
      out += x.toByte
    }
    out.result()
  }

  private def sleb(n0: Long): Array[Byte] = {
    var n = n0; val out = Array.newBuilder[Byte]
    var more = true
    while (more) {
      var x = (n & 0x7f).toInt; n >>= 7
      if ((n == 0 && (x & 0x40) == 0) || (n == -1 && (x & 0x40) != 0)) more = false
      else x |= 0x80
      out += x.toByte
    }
    out.result()
  }

  private def vec(items: Seq[Array[Byte]]): Array[Byte] = cat(uleb(items.size) +: items: _*)
  private def section(id: Int, body: Array[Byte]): Array[Byte] = cat(b(id), uleb(body.length), body)
  private def nm(s: String): Array[Byte] = cat(uleb(s.length), s.getBytes("UTF-8"))

  // -- opcode helpers --------------------------------------------------------
  private def GETL(i: Int) = cat(b(0x20), uleb(i))
  private def SETL(i: Int) = cat(b(0x21), uleb(i))
  private def GETG(i: Int) = cat(b(0x23), uleb(i))
  private def SETG(i: Int) = cat(b(0x24), uleb(i))
  private def I32C(v: Long) = cat(b(0x41), sleb(v))
  private def I64C(v: Long) = cat(b(0x42), sleb(v))
  private def LOAD8U(off: Int) = cat(b(0x2d, 0x00), uleb(off))
  private def LOAD32(off: Int) = cat(b(0x28, 0x02), uleb(off))
  private def STORE8(off: Int) = cat(b(0x3a, 0x00), uleb(off))
  private def STORE32(off: Int) = cat(b(0x36, 0x02), uleb(off))
  private def CALL(i: Int) = cat(b(0x10), uleb(i))
  private val ADD = b(0x6a); private val SUB = b(0x6b)
  private val AND = b(0x71); private val OR = b(0x72); private val SHL = b(0x74)
  private val EQ = b(0x46); private val NE = b(0x47); private val EQZ = b(0x45)
  private val LTU = b(0x49); private val GEU = b(0x4f); private val GTU = b(0x4b)
  private val I64ADD = b(0x7c); private val I64SHL = b(0x86)
  private val I64OR = b(0x84); private val I64SHRU = b(0x88)
  private val EXTU = b(0xad); private val WRAP = b(0xa7)
  private val UNREACH = b(0x00); private val END = b(0x0b)
  private def IFV(thn: Array[Byte]) = cat(b(0x04, 0x40), thn, END)
  private def IFELSE(thn: Array[Byte], els: Array[Byte]) = cat(b(0x04, 0x40), thn, b(0x05), els, END)
  private def IFI32(thn: Array[Byte], els: Array[Byte]) = cat(b(0x04, 0x7f), thn, b(0x05), els, END)
  private def BLOCK(body: Array[Byte]) = cat(b(0x02, 0x40), body, END)
  private def LOOP(body: Array[Byte]) = cat(b(0x03, 0x40), body, END)
  private def BR(d: Int) = cat(b(0x0c), uleb(d))
  private def BRIF(d: Int) = cat(b(0x0d), uleb(d))

  private def func(locals: Seq[(Int, Int)], code: Array[Byte]): Array[Byte] = {
    val body = cat(vec(locals.map { case (n, t) => cat(uleb(n), b(t)) }), code, END)
    cat(uleb(body.length), body)
  }

  /** trap unless byte at p+4 is 0x91 (fixarray of 1 argument) */
  private val checkFixarr1 =
    cat(GETL(0), LOAD8U(4), I32C(0x91), NE, IFV(UNREACH))

  // alloc(size): bump allocator over a per-ROW arena. The host deallocs
  // both buffers after decoding each row's result (WasmMsgPackUdf's
  // dealloc(inPtr)/dealloc(outPtr) pair), and dealloc resets the bump
  // pointer to the base — so a long scan never exhausts memory (the
  // throughput probe found the no-reuse version dying after ~6k rows).
  // When one CALL's allocations can't fit the 4-page region, TRAP
  // (unreachable) instead of wrapping mid-call: a wrap here would hand
  // out a result buffer overlapping the still-live argument buffer and
  // silently corrupt the result — for a conformance fixture, loud > fast.
  private val allocBody = func(Nil, cat(
    GETG(0), GETL(0), ADD, I32C(4 * 65536), GTU,
    IFV(UNREACH),
    GETG(0), GETG(0), GETL(0), ADD, SETG(0)))

  // dealloc(ptr, size): arena reset. Called only after the host has read
  // the framed result, so no allocation is live when the pointer rewinds.
  private val deallocBody = func(Nil, cat(I32C(65536), SETG(0)))

  // rev(p): locals len=1 src=2 out=3 i=4 hdr=5 tmp=6
  private val revBody = func(Seq((6, 0x7f)), cat(
    checkFixarr1,
    GETL(0), LOAD8U(5), SETL(6),
    GETL(6), I32C(0xE0), AND, I32C(0xA0), EQ,
    IFELSE( // fixstr: len in the tag, data at p+6
      cat(GETL(6), I32C(31), AND, SETL(1),
          GETL(0), I32C(6), ADD, SETL(2)),
      cat( // str8 (0xd9): len byte at p+6, data at p+7
        GETL(6), I32C(0xD9), NE, IFV(UNREACH),
        GETL(0), LOAD8U(6), SETL(1),
        GETL(0), I32C(7), ADD, SETL(2))),
    GETL(1), I32C(32), LTU, IFI32(I32C(1), I32C(2)), SETL(5),
    I32C(4), GETL(5), ADD, GETL(1), ADD, CALL(0), SETL(3),
    GETL(3), GETL(5), GETL(1), ADD, STORE32(0),
    GETL(5), I32C(1), EQ,
    IFELSE(
      cat(GETL(3), I32C(0xA0), GETL(1), OR, STORE8(4)),
      cat(GETL(3), I32C(0xD9), STORE8(4),
          GETL(3), GETL(1), STORE8(5))),
    GETL(3), I32C(4), ADD, GETL(5), ADD, SETL(6), // dst
    I32C(0), SETL(4),
    BLOCK(LOOP(cat(
      GETL(4), GETL(1), GEU, BRIF(1),
      GETL(6), GETL(4), ADD,
      GETL(2), GETL(1), ADD, GETL(4), SUB, I32C(1), SUB, LOAD8U(0),
      STORE8(0),
      GETL(4), I32C(1), ADD, SETL(4), BR(0)))),
    GETL(3)))

  // til(p): locals tag=1 out=2
  private val tilBody = func(Seq((2, 0x7f)), cat(
    checkFixarr1,
    GETL(0), LOAD8U(5), SETL(1),
    I32C(5), CALL(0), SETL(2),
    GETL(2), I32C(1), STORE32(0),
    GETL(1), I32C(0xC2), EQ,
    IFELSE(
      cat(GETL(2), I32C(0xC3), STORE8(4)),
      cat(GETL(1), I32C(0xC3), NE, IFV(UNREACH),
          GETL(2), I32C(0xC2), STORE8(4))),
    GETL(2)))

  // addhour(p): locals out=1 i=2 tag=3 (i32), v=4 (i64)
  private val addhourBody = func(Seq((3, 0x7f), (1, 0x7e)), cat(
    checkFixarr1,
    GETL(0), LOAD8U(5), SETL(3),
    GETL(3), I32C(0xCF), EQ, GETL(3), I32C(0xD3), EQ, OR, EQZ, IFV(UNREACH),
    I64C(0), SETL(4),
    I32C(0), SETL(2),
    BLOCK(LOOP(cat( // big-endian read of 8 bytes at p+6
      GETL(2), I32C(8), GEU, BRIF(1),
      GETL(4), I64C(8), I64SHL,
      GETL(0), GETL(2), ADD, LOAD8U(6), EXTU,
      I64OR, SETL(4),
      GETL(2), I32C(1), ADD, SETL(2), BR(0)))),
    GETL(4), I64C(3600000000000L), I64ADD, SETL(4),
    I32C(13), CALL(0), SETL(1),
    GETL(1), I32C(9), STORE32(0),
    GETL(1), I32C(0xD3), STORE8(4),
    I32C(0), SETL(2),
    BLOCK(LOOP(cat( // big-endian write of v at out+5
      GETL(2), I32C(8), GEU, BRIF(1),
      GETL(1), GETL(2), ADD,
      GETL(4), I32C(56), GETL(2), I32C(3), SHL, SUB, EXTU, I64SHRU, WRAP,
      STORE8(5),
      GETL(2), I32C(1), ADD, SETL(2), BR(0)))),
    GETL(1)))

  // ident(p): strip the fixarray header — locals len=1 out=2 i=3
  private val identBody = func(Seq((3, 0x7f)), cat(
    GETL(0), LOAD32(0), SETL(1),
    checkFixarr1,
    I32C(3), GETL(1), ADD, CALL(0), SETL(2),
    GETL(2), GETL(1), I32C(1), SUB, STORE32(0),
    I32C(0), SETL(3),
    BLOCK(LOOP(cat(
      GETL(3), GETL(1), I32C(1), SUB, GEU, BRIF(1),
      GETL(2), GETL(3), ADD,
      GETL(0), GETL(3), ADD, LOAD8U(5),
      STORE8(4),
      GETL(3), I32C(1), ADD, SETL(3), BR(0)))),
    GETL(2)))

  private def assemble(withAlloc: Boolean): Array[Byte] = {
    val exports = Seq(
      Some(cat(nm("memory"), b(0x02), uleb(0))),
      if (withAlloc) Some(cat(nm("alloc"), b(0x00), uleb(0))) else None,
      Some(cat(nm("dealloc"), b(0x00), uleb(1))),
      Some(cat(nm("rev"), b(0x00), uleb(2))),
      Some(cat(nm("til"), b(0x00), uleb(3))),
      Some(cat(nm("addhour"), b(0x00), uleb(4))),
      Some(cat(nm("ident"), b(0x00), uleb(5)))).flatten
    cat(
      b(0x00, 0x61, 0x73, 0x6d), b(0x01, 0x00, 0x00, 0x00),
      section(1, vec(Seq(
        cat(b(0x60), vec(Seq(b(0x7f))), vec(Seq(b(0x7f)))),
        cat(b(0x60), vec(Seq(b(0x7f), b(0x7f))), vec(Seq()))))),
      section(3, vec(Seq(uleb(0), uleb(1), uleb(0), uleb(0), uleb(0), uleb(0)))),
      section(5, vec(Seq(cat(b(0x00), uleb(4))))), // memory, min 4 pages
      section(6, vec(Seq(cat(b(0x7f, 0x01), I32C(65536), END)))), // mutable heap top
      section(7, vec(exports)),
      section(10, vec(Seq(allocBody, deallocBody, revBody, tilBody, addhourBody, identBody))))
  }

  lazy val moduleBytes: Array[Byte] = assemble(withAlloc = true)
  lazy val moduleB64: String = java.util.Base64.getEncoder.encodeToString(moduleBytes)
  lazy val moduleB64NoAlloc: String =
    java.util.Base64.getEncoder.encodeToString(assemble(withAlloc = false))

  /** The public sintau/exp2/log2/evalpoly f32 module (raw-numeric ABI). */
  private val sintauHex =
    ("0061736d01000000010d0260017d017d60037d7f7f017d03050400000001" +
     "0504010144440718030673696e746175000004657870320001046c6f6732" +
     "00020a8e01042901027d430000003f2202200020008e9322002002938b22" +
     "01932001964100411810032002200093980b1900200020008e2200934118" +
     "412c1003bc2000a84117746abe0b2501017f2000bc220141177641ff006b" +
     "b22001410974b3430000804f95412c41c4001003920b2201017d03402003" +
     "20009420012a0200922103200141046a220120026b0d000b20030b0b4a01" +
     "0041000b443fc76142d9e013414baa2ac273b2a63d4001c9407e95d0366f" +
     "f95f3c90f2533d2267773eac66313f1d00803ff725303d03fd3fbe17a6d1" +
     "3e4cdc34bfd382b83ffc888a37006a046e616d65011f04000673696e7461" +
     "7501046578703202046c6f673203086576616c706f6c7902370400030001" +
     "7801027831020468616c6601010001780202000178010278690304000178" +
     "010573746172740203656e640306726573756c74030901030100046c6f6f" +
     "70")

  lazy val sintauBytes: Array[Byte] =
    sintauHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  lazy val sintauB64: String = java.util.Base64.getEncoder.encodeToString(sintauBytes)
}

