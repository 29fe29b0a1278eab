package graft.functions.wasm

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WebAssembly MVP interpreter for the raw-numeric UDF ABI
  * (reference `src/wasm_udf/wasm.rs:84-241`, types
  * `src/wasm_udf/data_types.rs:11-29`): scalar functions over
  * I32/I64/F32/F64 with linear memory, globals, tables and the full MVP
  * numeric/control instruction set — enough to execute real compiled
  * modules (the reference's own test functions are hand-written or
  * clang-compiled WASM). WASI preview1 imports resolve to no-op stubs
  * (enough for Rust `wasm32-wasi` modules that never actually do I/O),
  * which is what the wasmMessagePack ABI's compiled guests link against;
  * any other import traps by name at call time.
  *
  * Values are type-erased to raw 64-bit lanes (f32 as float bits, i32 as
  * sign-extended low 32) — the classic interpreter representation; module
  * validation guarantees operand types, so each opcode just reinterprets
  * its lanes.
  */
object Wasm {

  // --- module model ---------------------------------------------------------

  case class FuncType(params: Seq[Byte], results: Seq[Byte])

  sealed trait Instr
  // plain op: opcode + up to two immediates packed as longs
  final case class Op(code: Int, a: Long = 0L, b: Long = 0L) extends Instr
  final case class Blk(loop: Boolean, arity: Int, body: Array[Instr]) extends Instr
  final case class Iff(arity: Int, thn: Array[Instr], els: Array[Instr]) extends Instr
  final case class BrTable(targets: Array[Int], default: Int) extends Instr

  case class FuncDef(typeIdx: Int, locals: Int, body: Array[Instr])

  class Module(bytes: Array[Byte]) {
    private val in = new Reader(bytes)
    var types: Vector[FuncType] = Vector.empty
    var funcTypeIdx: Vector[Int] = Vector.empty // GLOBAL function index space
    var funcs: Vector[FuncDef] = Vector.empty // module-defined funcs only
    /** (module, name) of imported functions; they occupy indices
      * 0..numImports-1 of the function index space (WASM spec) and are
      * dispatched to host stubs (the WASI surface a Rust `wasm32-wasi`
      * module links even when unused). */
    var importedFuncs: Vector[(String, String)] = Vector.empty
    var exports: Map[String, (Int, Int)] = Map.empty // name -> (kind, idx)
    var memPages: Int = 0
    var globalsInit: Vector[Long] = Vector.empty
    var tableInit: Vector[Int] = Vector.empty
    var data: Vector[(Int, Array[Byte])] = Vector.empty
    var startFunc: Option[Int] = None
    parse()

    def numImports: Int = importedFuncs.size

    def funcType(f: Int): FuncType = types(funcTypeIdx(f))

    def exportedFunc(name: String): Int = exports.get(name) match {
      case Some((0, idx)) => idx
      case _ => throw new IllegalArgumentException(
        s"Required export '$name' could not be located in WASM module exports")
    }

    private def parse(): Unit = {
      require(in.u32raw() == 0x6d736100, "not a WASM module (bad magic)")
      require(in.u32raw() == 1, "unsupported WASM version")
      while (in.hasMore) {
        val id = in.byte()
        val size = in.uleb32()
        val end = in.pos + size
        id match {
          case 1 => // types
            types = Vector.fill(in.uleb32()) {
              require(in.byte() == 0x60, "expected func type")
              val ps = Seq.fill(in.uleb32())(in.byte())
              val rs = Seq.fill(in.uleb32())(in.byte())
              FuncType(ps, rs)
            }
          case 2 => // imports: function imports become host stubs (WASI);
            // memory/table/global imports stay unsupported
            (0 until in.uleb32()).foreach { _ =>
              val mod = new String(in.bytes(in.uleb32()), "UTF-8")
              val name = new String(in.bytes(in.uleb32()), "UTF-8")
              in.byte() match {
                case 0 =>
                  importedFuncs :+= (mod, name)
                  funcTypeIdx :+= in.uleb32()
                case kind => throw new UnsupportedOperationException(
                  s"WASM import $mod.$name of kind $kind (non-function) is not supported")
              }
            }
          case 3 => funcTypeIdx = funcTypeIdx ++ Vector.fill(in.uleb32())(in.uleb32())
          case 4 => // tables: single funcref table
            (0 until in.uleb32()).foreach { _ =>
              in.byte() // elem type (0x70 funcref)
              val flags = in.byte()
              val min = in.uleb32()
              if (flags == 1) in.uleb32()
              if (tableInit.isEmpty) tableInit = Vector.fill(min)(-1)
            }
          case 5 => // memories
            (0 until in.uleb32()).foreach { _ =>
              val flags = in.byte()
              val min = in.uleb32()
              if ((flags & 1) == 1) in.uleb32()
              if (min > MaxPages) throw new UnsupportedOperationException(
                s"WASM module declares $min min memory pages, exceeding the " +
                  s"$MaxPages-page (${MaxPages / 16} MiB) cap")
              memPages = min
            }
          case 6 => // globals: init exprs are const (or prior global.get)
            globalsInit = Vector.fill(in.uleb32()) {
              in.byte() // valtype
              in.byte() // mutability
              val v = constExpr()
              v
            }
          case 7 =>
            exports = (0 until in.uleb32()).map { _ =>
              val name = new String(in.bytes(in.uleb32()), "UTF-8")
              val kind = in.byte().toInt
              name -> (kind, in.uleb32())
            }.toMap
          case 8 => startFunc = Some(in.uleb32())
          case 9 => // element segments (flavor 0: active, table 0)
            (0 until in.uleb32()).foreach { _ =>
              val flavor = in.uleb32()
              require(flavor == 0, s"unsupported element segment flavor $flavor")
              val off = constExpr().toInt
              val fns = Vector.fill(in.uleb32())(in.uleb32())
              val t = tableInit.toArray
              fns.zipWithIndex.foreach { case (f, i) => t(off + i) = f }
              tableInit = t.toVector
            }
          case 10 => // code
            funcs = Vector.tabulate(in.uleb32()) { i =>
              val bodySize = in.uleb32()
              val bodyEnd = in.pos + bodySize
              var nLocals = 0
              (0 until in.uleb32()).foreach { _ =>
                val cnt = in.uleb32(); in.byte(); nLocals += cnt
              }
              val body = parseInstrs(stopOnElse = false)._1
              require(in.pos == bodyEnd, s"function $i body mis-parsed")
              FuncDef(funcTypeIdx(numImports + i), nLocals, body)
            }
          case 11 => // data segments (active, memory 0)
            data = Vector.fill(in.uleb32()) {
              val flavor = in.uleb32()
              require(flavor == 0, s"unsupported data segment flavor $flavor")
              val off = constExpr().toInt
              (off, in.bytes(in.uleb32()))
            }
          case _ => in.skip(size) // custom / unknown
        }
        require(in.pos == end || id == 0, s"section $id mis-parsed")
        if (in.pos != end) in.seek(end)
      }
    }

    /** const initializer expr: single const/global.get + end */
    private def constExpr(): Long = {
      val v = in.byte() match {
        case 0x41 => in.sleb32().toLong
        case 0x42 => in.sleb64()
        case 0x43 => java.lang.Float.floatToRawIntBits(in.f32()).toLong
        case 0x44 => java.lang.Double.doubleToRawLongBits(in.f64())
        case 0x23 => globalsInit(in.uleb32())
        case op => throw new UnsupportedOperationException(f"init expr opcode 0x$op%02x")
      }
      require(in.byte() == 0x0b, "init expr must end with END")
      v
    }

    private def blockArity(): Int = {
      val b = in.sleb33()
      if (b == -0x40) 0 // empty
      else if (b < 0) 1 // single valtype
      else types(b.toInt).results.size
    }

    /** Parse until END (or ELSE when stopOnElse); returns (instrs, sawElse). */
    private def parseInstrs(stopOnElse: Boolean): (Array[Instr], Boolean) = {
      val out = Vector.newBuilder[Instr]
      while (true) {
        val op = in.byte() & 0xff
        op match {
          case 0x0b => return (out.result().toArray, false)
          case 0x05 if stopOnElse => return (out.result().toArray, true)
          case 0x02 | 0x03 =>
            val ar = blockArity()
            val (body, _) = parseInstrs(stopOnElse = false)
            out += Blk(loop = op == 0x03, ar, body)
          case 0x04 =>
            val ar = blockArity()
            val (thn, sawElse) = parseInstrs(stopOnElse = true)
            val els = if (sawElse) parseInstrs(stopOnElse = false)._1 else Array.empty[Instr]
            out += Iff(ar, thn, els)
          case 0x0e =>
            val ts = Array.fill(in.uleb32())(in.uleb32())
            out += BrTable(ts, in.uleb32())
          case 0x0c | 0x0d | 0x10 | 0x20 | 0x21 | 0x22 | 0x23 | 0x24 =>
            out += Op(op, in.uleb32().toLong)
          case 0x11 => out += Op(op, in.uleb32().toLong, in.uleb32().toLong)
          case 0x41 => out += Op(op, in.sleb32().toLong)
          case 0x42 => out += Op(op, in.sleb64())
          case 0x43 => out += Op(op, java.lang.Float.floatToRawIntBits(in.f32()).toLong)
          case 0x44 => out += Op(op, java.lang.Double.doubleToRawLongBits(in.f64()))
          case ld if ld >= 0x28 && ld <= 0x3e => // loads/stores: align + offset
            out += Op(op, in.uleb32().toLong, in.uleb32().toLong)
          case 0x3f | 0x40 => in.byte(); out += Op(op) // memory.size/grow (mem idx)
          case 0x1c => in.uleb32(); out += Op(0x1b) // typed select -> select
          case 0xfc =>
            val sub = in.uleb32()
            sub match {
              case s if s <= 7 => out += Op(0xfc00 + s) // trunc_sat
              case 10 => in.byte(); in.byte(); out += Op(0xfc0a) // memory.copy
              case 11 => in.byte(); out += Op(0xfc0b) // memory.fill
              case s => throw new UnsupportedOperationException(s"0xFC subop $s")
            }
          case _ => out += Op(op)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  // --- binary reader --------------------------------------------------------

  private class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def byte(): Byte = { val b = buf(pos); pos += 1; b }
    def bytes(n: Int): Array[Byte] = { val r = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; r }
    def skip(n: Int): Unit = pos += n
    def seek(p: Int): Unit = pos = p
    def u32raw(): Int = {
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def f32(): Float = { val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat; pos += 4; v }
    def f64(): Double = { val v = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble; pos += 8; v }
    def uleb32(): Int = uleb64().toInt
    def uleb64(): Long = {
      var r = 0L; var s = 0
      while (true) {
        val b = byte() & 0xff
        r |= (b & 0x7fL) << s
        if ((b & 0x80) == 0) return r
        s += 7
      }
      r
    }
    def sleb32(): Int = sleb64().toInt
    def sleb33(): Long = sleb64()
    def sleb64(): Long = {
      var r = 0L; var s = 0; var b = 0
      while ({
        b = byte() & 0xff
        r |= (b & 0x7fL) << s
        s += 7
        (b & 0x80) != 0
      }) ()
      if (s < 64 && (b & 0x40) != 0) r |= -1L << s
      r
    }
  }

  // --- instance -------------------------------------------------------------

  private val PageSize = 65536
  private val MaxPages = 4096 // 256 MiB cap

  class Trap(msg: String) extends RuntimeException(msg)

  /** Execution budget per top-level call, in interpreter steps — the
    * isolation wasmtime's fuel metering provides in the reference
    * (seafowl src/wasm_udf/wasm.rs:84-241): without it a user-created
    * function with an infinite loop pins an executor thread for the
    * whole query. 10⁸ steps ≈ a second of interpreter work — orders of
    * magnitude above any real scalar UDF, hit only by runaways. */
  val DefaultFuel: Long = 100000000L

  /** An instantiated module: its own memory/globals/table. NOT thread-safe
    * (callers keep one instance per thread). `fuelBudget` bounds every
    * top-level invoke (nested/indirect calls share the caller's tank);
    * exhaustion raises a Trap, surfaced like any other module trap. */
  class Instance(val module: Module, val fuelBudget: Long = DefaultFuel) {
    private var fuel: Long = fuelBudget
    private var depth: Int = 0
    private var mem: Array[Byte] =
      new Array[Byte](math.min(module.memPages, MaxPages) * PageSize)
    private var mb: ByteBuffer = ByteBuffer.wrap(mem).order(ByteOrder.LITTLE_ENDIAN)
    private val globals: Array[Long] = module.globalsInit.toArray
    private val table: Array[Int] = module.tableInit.toArray
    module.data.foreach { case (off, bs) => System.arraycopy(bs, 0, mem, off, bs.length) }
    module.startFunc.foreach(invoke(_, Array.empty))

    /** Call function `idx` with raw-lane args; returns the raw result lane
      * (0 for void). */
    def invoke(idx: Int, args: Array[Long]): Long = {
      if (idx < module.numImports) return hostCall(idx, args)
      val fd = module.funcs(idx - module.numImports)
      val ft = module.funcType(idx)
      if (args.length != ft.params.size)
        throw new IllegalArgumentException(
          s"function expects ${ft.params.size} arguments, got ${args.length}")
      val locals = new Array[Long](ft.params.size + fd.locals)
      System.arraycopy(args, 0, locals, 0, args.length)
      val st = new Stack
      if (depth == 0) fuel = fuelBudget // fresh tank per top-level call
      depth += 1
      try exec(fd.body, locals, st)
      finally depth -= 1
      if (ft.results.nonEmpty) st.pop() else 0L
    }

    /** Bounds-checked guest-memory access for host-side ABIs (msgpack). */
    def readMemory(ptr: Int, len: Int): Array[Byte] = {
      if (ptr < 0 || len < 0 || ptr.toLong + len > mem.length)
        throw new Trap(s"out-of-bounds host read of $len bytes at $ptr")
      java.util.Arrays.copyOfRange(mem, ptr, ptr + len)
    }
    def writeMemory(ptr: Int, bytes: Array[Byte]): Unit = {
      if (ptr < 0 || ptr.toLong + bytes.length > mem.length)
        throw new Trap(s"out-of-bounds host write of ${bytes.length} bytes at $ptr")
      System.arraycopy(bytes, 0, mem, ptr, bytes.length)
    }
    def readI32(ptr: Int): Int = {
      if (ptr < 0 || ptr.toLong + 4 > mem.length)
        throw new Trap(s"out-of-bounds host read of 4 bytes at $ptr")
      mb.getInt(ptr)
    }
    def writeI32(ptr: Int, v: Int): Unit = {
      if (ptr < 0 || ptr.toLong + 4 > mem.length)
        throw new Trap(s"out-of-bounds host write of 4 bytes at $ptr")
      mb.putInt(ptr, v)
    }

    /** Minimal WASI-preview1 stubs: enough for a `wasm32-wasi` Rust module
      * that never actually does I/O (the reference links full WASI; its
      * msgpack test module only touches fd_write/environ/proc_exit on the
      * panic path). Everything else traps by name. */
    private def hostCall(idx: Int, a: Array[Long]): Long = {
      val (m, name) = module.importedFuncs(idx)
      if (m != "wasi_snapshot_preview1" && m != "wasi_unstable")
        throw new Trap(s"call to unlinked import $m.$name")
      name match {
        case "fd_write" => // discard bytes, report them all written
          val iovs = a(1).toInt
          val n = a(2).toInt
          var total = 0
          var i = 0
          while (i < n) { total += readI32(iovs + 8 * i + 4); i += 1 }
          writeI32(a(3).toInt, total)
          0L
        case "environ_sizes_get" | "args_sizes_get" =>
          writeI32(a(0).toInt, 0); writeI32(a(1).toInt, 0); 0L
        case "environ_get" | "args_get" => 0L
        case "random_get" => // deterministic: zero-fill
          val p = a(0).toInt
          val len = a(1).toInt
          if (p < 0 || len < 0 || p.toLong + len > mem.length)
            throw new Trap(s"out-of-bounds random_get of $len bytes at $p")
          java.util.Arrays.fill(mem, p, p + len, 0.toByte)
          0L
        case "clock_time_get" => writeI32(a(2).toInt, 0); writeI32(a(2).toInt + 4, 0); 0L
        case "proc_exit" => throw new Trap(s"proc_exit(${a(0)})")
        case other => throw new Trap(s"WASI function $other is not supported")
      }
    }

    private final class Stack {
      private var a = new Array[Long](64)
      var n = 0
      def push(v: Long): Unit = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
        a(n) = v; n += 1
      }
      def pop(): Long = { n -= 1; a(n) }
      def peek: Long = a(n - 1)
      /** keep top `arity` values, truncate below to height h */
      def unwind(h: Int, arity: Int): Unit = {
        if (n > h + arity) {
          var i = 0
          while (i < arity) { a(h + i) = a(n - arity + i); i += 1 }
          n = h + arity
        }
      }
    }

    private val RET = Int.MaxValue

    // returns -1 for fall-through, k >= 0 for a branch escaping k labels,
    // RET for return
    private def exec(body: Array[Instr], locals: Array[Long], st: Stack): Int = {
      var i = 0
      while (i < body.length) {
        fuel -= 1
        if (fuel <= 0L)
          throw new Trap(s"fuel exhausted: call exceeded $fuelBudget interpreter steps")
        body(i) match {
          case Blk(loop, arity, inner) =>
            val h = st.n
            var done = false
            while (!done) {
              val r = exec(inner, locals, st)
              if (r == RET) return RET
              else if (r < 0) done = true // fell through
              else if (r == 0) {
                if (loop) st.unwind(h, 0) // br to loop start: repeat
                else { st.unwind(h, arity); done = true }
              } else return r - 1
            }
          case Iff(arity, thn, els) =>
            val c = st.pop().toInt
            val h = st.n
            val r = exec(if (c != 0) thn else els, locals, st)
            if (r == RET) return RET
            else if (r == 0) st.unwind(h, arity)
            else if (r > 0) return r - 1
          case BrTable(ts, default) =>
            val idx = st.pop().toInt
            return if (idx >= 0 && idx < ts.length) ts(idx) else default
          case Op(code, x, y) =>
            val r = simple(code, x, y, locals, st)
            if (r != Int.MinValue) return r
        }
        i += 1
      }
      -1
    }

    // Int.MinValue = keep going; otherwise branch/return signal
    private def simple(code: Int, x: Long, y: Long, locals: Array[Long], st: Stack): Int = {
      @inline def pf(v: Long): Float = java.lang.Float.intBitsToFloat(v.toInt)
      @inline def bf(v: Float): Long = java.lang.Float.floatToRawIntBits(v).toLong
      @inline def pd(v: Long): Double = java.lang.Double.longBitsToDouble(v)
      @inline def bd(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)
      @inline def i32(v: Long): Int = v.toInt
      @inline def b32(v: Int): Long = v.toLong // sign-extended lane
      @inline def bool(c: Boolean): Long = if (c) 1L else 0L
      code match {
        case 0x00 => throw new Trap("unreachable executed")
        case 0x01 => // nop
        case 0x0c => return x.toInt // br
        case 0x0d => if (st.pop().toInt != 0) return x.toInt // br_if
        case 0x0f => return RET
        case 0x10 => callInto(x.toInt, st) // call
        case 0x11 => // call_indirect
          val elem = st.pop().toInt
          if (elem < 0 || elem >= table.length || table(elem) < 0)
            throw new Trap(s"call_indirect: invalid table entry $elem")
          callInto(table(elem), st)
        case 0x1a => st.pop() // drop
        case 0x1b => // select
          val c = st.pop().toInt; val v2 = st.pop(); val v1 = st.pop()
          st.push(if (c != 0) v1 else v2)
        case 0x20 => st.push(locals(x.toInt))
        case 0x21 => locals(x.toInt) = st.pop()
        case 0x22 => locals(x.toInt) = st.peek
        case 0x23 => st.push(globals(x.toInt))
        case 0x24 => globals(x.toInt) = st.pop()
        // loads (x = align, y = offset; base address popped from stack)
        case 0x28 => st.push(b32(mb.getInt(addr(st.pop(), y, 4))))
        case 0x29 => st.push(mb.getLong(addr(st.pop(), y, 8)))
        case 0x2a => st.push(mb.getInt(addr(st.pop(), y, 4)).toLong & 0xffffffffL) // f32 bits
        case 0x2b => st.push(mb.getLong(addr(st.pop(), y, 8))) // f64 bits
        case 0x2c => st.push(b32(mem(addr(st.pop(), y, 1)).toInt))
        case 0x2d => st.push((mem(addr(st.pop(), y, 1)) & 0xff).toLong)
        case 0x2e => st.push(b32(mb.getShort(addr(st.pop(), y, 2)).toInt))
        case 0x2f => st.push((mb.getShort(addr(st.pop(), y, 2)) & 0xffff).toLong)
        case 0x30 => st.push(mem(addr(st.pop(), y, 1)).toLong)
        case 0x31 => st.push((mem(addr(st.pop(), y, 1)) & 0xff).toLong)
        case 0x32 => st.push(mb.getShort(addr(st.pop(), y, 2)).toLong)
        case 0x33 => st.push((mb.getShort(addr(st.pop(), y, 2)) & 0xffff).toLong)
        case 0x34 => st.push(mb.getInt(addr(st.pop(), y, 4)).toLong)
        case 0x35 => st.push(mb.getInt(addr(st.pop(), y, 4)).toLong & 0xffffffffL)
        // stores (value on top, base below)
        case 0x36 => val v = st.pop(); mb.putInt(addr(st.pop(), y, 4), v.toInt)
        case 0x37 => val v = st.pop(); mb.putLong(addr(st.pop(), y, 8), v)
        case 0x38 => val v = st.pop(); mb.putInt(addr(st.pop(), y, 4), v.toInt)
        case 0x39 => val v = st.pop(); mb.putLong(addr(st.pop(), y, 8), v)
        case 0x3a => val v = st.pop(); mem(addr(st.pop(), y, 1)) = v.toByte
        case 0x3b => val v = st.pop(); mb.putShort(addr(st.pop(), y, 2), v.toShort)
        case 0x3c => val v = st.pop(); mem(addr(st.pop(), y, 1)) = v.toByte
        case 0x3d => val v = st.pop(); mb.putShort(addr(st.pop(), y, 2), v.toShort)
        case 0x3e => val v = st.pop(); mb.putInt(addr(st.pop(), y, 4), v.toInt)
        case 0x3f => st.push(b32(mem.length / PageSize))
        case 0x40 =>
          val delta = st.pop().toInt
          val cur = mem.length / PageSize
          if (delta < 0 || cur + delta > MaxPages) st.push(b32(-1))
          else {
            mem = java.util.Arrays.copyOf(mem, (cur + delta) * PageSize)
            mb = ByteBuffer.wrap(mem).order(ByteOrder.LITTLE_ENDIAN)
            st.push(b32(cur))
          }
        // consts (immediate already in lane form)
        case 0x41 | 0x42 | 0x43 | 0x44 => st.push(x)
        // i32 compare
        case 0x45 => st.push(bool(st.pop().toInt == 0))
        case 0x46 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(a == b))
        case 0x47 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(a != b))
        case 0x48 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(a < b))
        case 0x49 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(java.lang.Integer.compareUnsigned(a, b) < 0))
        case 0x4a => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(a > b))
        case 0x4b => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(java.lang.Integer.compareUnsigned(a, b) > 0))
        case 0x4c => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(a <= b))
        case 0x4d => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(java.lang.Integer.compareUnsigned(a, b) <= 0))
        case 0x4e => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(a >= b))
        case 0x4f => val b = st.pop().toInt; val a = st.pop().toInt; st.push(bool(java.lang.Integer.compareUnsigned(a, b) >= 0))
        // i64 compare
        case 0x50 => st.push(bool(st.pop() == 0L))
        case 0x51 => val b = st.pop(); val a = st.pop(); st.push(bool(a == b))
        case 0x52 => val b = st.pop(); val a = st.pop(); st.push(bool(a != b))
        case 0x53 => val b = st.pop(); val a = st.pop(); st.push(bool(a < b))
        case 0x54 => val b = st.pop(); val a = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(a, b) < 0))
        case 0x55 => val b = st.pop(); val a = st.pop(); st.push(bool(a > b))
        case 0x56 => val b = st.pop(); val a = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(a, b) > 0))
        case 0x57 => val b = st.pop(); val a = st.pop(); st.push(bool(a <= b))
        case 0x58 => val b = st.pop(); val a = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(a, b) <= 0))
        case 0x59 => val b = st.pop(); val a = st.pop(); st.push(bool(a >= b))
        case 0x5a => val b = st.pop(); val a = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(a, b) >= 0))
        // f32 compare
        case 0x5b => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bool(a == b))
        case 0x5c => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bool(a != b))
        case 0x5d => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bool(a < b))
        case 0x5e => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bool(a > b))
        case 0x5f => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bool(a <= b))
        case 0x60 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bool(a >= b))
        // f64 compare
        case 0x61 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bool(a == b))
        case 0x62 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bool(a != b))
        case 0x63 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bool(a < b))
        case 0x64 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bool(a > b))
        case 0x65 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bool(a <= b))
        case 0x66 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bool(a >= b))
        // i32 arithmetic
        case 0x67 => st.push(b32(java.lang.Integer.numberOfLeadingZeros(st.pop().toInt)))
        case 0x68 => st.push(b32(java.lang.Integer.numberOfTrailingZeros(st.pop().toInt)))
        case 0x69 => st.push(b32(java.lang.Integer.bitCount(st.pop().toInt)))
        case 0x6a => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a + b))
        case 0x6b => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a - b))
        case 0x6c => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a * b))
        case 0x6d =>
          val b = st.pop().toInt; val a = st.pop().toInt
          if (b == 0) throw new Trap("i32.div_s: division by zero")
          if (a == Int.MinValue && b == -1) throw new Trap("i32.div_s: overflow")
          st.push(b32(a / b))
        case 0x6e =>
          val b = st.pop().toInt; val a = st.pop().toInt
          if (b == 0) throw new Trap("i32.div_u: division by zero")
          st.push(b32(java.lang.Integer.divideUnsigned(a, b)))
        case 0x6f =>
          val b = st.pop().toInt; val a = st.pop().toInt
          if (b == 0) throw new Trap("i32.rem_s: division by zero")
          st.push(b32(if (a == Int.MinValue && b == -1) 0 else a % b))
        case 0x70 =>
          val b = st.pop().toInt; val a = st.pop().toInt
          if (b == 0) throw new Trap("i32.rem_u: division by zero")
          st.push(b32(java.lang.Integer.remainderUnsigned(a, b)))
        case 0x71 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a & b))
        case 0x72 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a | b))
        case 0x73 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a ^ b))
        case 0x74 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a << b))
        case 0x75 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a >> b))
        case 0x76 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(a >>> b))
        case 0x77 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(java.lang.Integer.rotateLeft(a, b)))
        case 0x78 => val b = st.pop().toInt; val a = st.pop().toInt; st.push(b32(java.lang.Integer.rotateRight(a, b)))
        // i64 arithmetic
        case 0x79 => st.push(java.lang.Long.numberOfLeadingZeros(st.pop()).toLong)
        case 0x7a => st.push(java.lang.Long.numberOfTrailingZeros(st.pop()).toLong)
        case 0x7b => st.push(java.lang.Long.bitCount(st.pop()).toLong)
        case 0x7c => val b = st.pop(); val a = st.pop(); st.push(a + b)
        case 0x7d => val b = st.pop(); val a = st.pop(); st.push(a - b)
        case 0x7e => val b = st.pop(); val a = st.pop(); st.push(a * b)
        case 0x7f =>
          val b = st.pop(); val a = st.pop()
          if (b == 0) throw new Trap("i64.div_s: division by zero")
          if (a == Long.MinValue && b == -1) throw new Trap("i64.div_s: overflow")
          st.push(a / b)
        case 0x80 =>
          val b = st.pop(); val a = st.pop()
          if (b == 0) throw new Trap("i64.div_u: division by zero")
          st.push(java.lang.Long.divideUnsigned(a, b))
        case 0x81 =>
          val b = st.pop(); val a = st.pop()
          if (b == 0) throw new Trap("i64.rem_s: division by zero")
          st.push(if (a == Long.MinValue && b == -1) 0L else a % b)
        case 0x82 =>
          val b = st.pop(); val a = st.pop()
          if (b == 0) throw new Trap("i64.rem_u: division by zero")
          st.push(java.lang.Long.remainderUnsigned(a, b))
        case 0x83 => val b = st.pop(); val a = st.pop(); st.push(a & b)
        case 0x84 => val b = st.pop(); val a = st.pop(); st.push(a | b)
        case 0x85 => val b = st.pop(); val a = st.pop(); st.push(a ^ b)
        case 0x86 => val b = st.pop(); val a = st.pop(); st.push(a << b)
        case 0x87 => val b = st.pop(); val a = st.pop(); st.push(a >> b)
        case 0x88 => val b = st.pop(); val a = st.pop(); st.push(a >>> b)
        case 0x89 => val b = st.pop(); val a = st.pop(); st.push(java.lang.Long.rotateLeft(a, b.toInt))
        case 0x8a => val b = st.pop(); val a = st.pop(); st.push(java.lang.Long.rotateRight(a, b.toInt))
        // f32 arithmetic
        case 0x8b => st.push(bf(math.abs(pf(st.pop()))))
        case 0x8c => st.push(bf(-pf(st.pop())))
        case 0x8d => st.push(bf(math.ceil(pf(st.pop()).toDouble).toFloat))
        case 0x8e => st.push(bf(math.floor(pf(st.pop()).toDouble).toFloat))
        case 0x8f => val v = pf(st.pop()); st.push(bf((if (v < 0) math.ceil(v.toDouble) else math.floor(v.toDouble)).toFloat))
        case 0x90 => st.push(bf(math.rint(pf(st.pop()).toDouble).toFloat))
        case 0x91 => st.push(bf(math.sqrt(pf(st.pop()).toDouble).toFloat))
        case 0x92 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(a + b))
        case 0x93 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(a - b))
        case 0x94 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(a * b))
        case 0x95 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(a / b))
        case 0x96 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(java.lang.Math.min(a, b)))
        case 0x97 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(java.lang.Math.max(a, b)))
        case 0x98 => val b = pf(st.pop()); val a = pf(st.pop()); st.push(bf(java.lang.Math.copySign(a, b)))
        // f64 arithmetic
        case 0x99 => st.push(bd(math.abs(pd(st.pop()))))
        case 0x9a => st.push(bd(-pd(st.pop())))
        case 0x9b => st.push(bd(math.ceil(pd(st.pop()))))
        case 0x9c => st.push(bd(math.floor(pd(st.pop()))))
        case 0x9d => val v = pd(st.pop()); st.push(bd(if (v < 0) math.ceil(v) else math.floor(v)))
        case 0x9e => st.push(bd(math.rint(pd(st.pop()))))
        case 0x9f => st.push(bd(math.sqrt(pd(st.pop()))))
        case 0xa0 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(a + b))
        case 0xa1 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(a - b))
        case 0xa2 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(a * b))
        case 0xa3 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(a / b))
        case 0xa4 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(java.lang.Math.min(a, b)))
        case 0xa5 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(java.lang.Math.max(a, b)))
        case 0xa6 => val b = pd(st.pop()); val a = pd(st.pop()); st.push(bd(java.lang.Math.copySign(a, b)))
        // conversions
        case 0xa7 => st.push(b32(st.pop().toInt))
        case 0xa8 => st.push(b32(truncToI32(pf(st.pop()).toDouble, signed = true, "f32")))
        case 0xa9 => st.push(b32(truncToI32(pf(st.pop()).toDouble, signed = false, "f32")))
        case 0xaa => st.push(b32(truncToI32(pd(st.pop()), signed = true, "f64")))
        case 0xab => st.push(b32(truncToI32(pd(st.pop()), signed = false, "f64")))
        case 0xac => st.push(st.pop().toInt.toLong)
        case 0xad => st.push(st.pop() & 0xffffffffL)
        case 0xae => st.push(truncToI64(pf(st.pop()).toDouble, signed = true, "f32"))
        case 0xaf => st.push(truncToI64(pf(st.pop()).toDouble, signed = false, "f32"))
        case 0xb0 => st.push(truncToI64(pd(st.pop()), signed = true, "f64"))
        case 0xb1 => st.push(truncToI64(pd(st.pop()), signed = false, "f64"))
        case 0xb2 => st.push(bf(st.pop().toInt.toFloat))
        case 0xb3 => st.push(bf((st.pop().toInt.toLong & 0xffffffffL).toFloat))
        case 0xb4 => st.push(bf(st.pop().toFloat))
        case 0xb5 => val v = st.pop(); st.push(bf(ulongToDouble(v).toFloat))
        case 0xb6 => st.push(bf(pd(st.pop()).toFloat))
        case 0xb7 => st.push(bd(st.pop().toInt.toDouble))
        case 0xb8 => st.push(bd((st.pop().toInt.toLong & 0xffffffffL).toDouble))
        case 0xb9 => st.push(bd(st.pop().toDouble))
        case 0xba => val v = st.pop(); st.push(bd(ulongToDouble(v)))
        case 0xbb => st.push(bd(pf(st.pop()).toDouble))
        case 0xbc => st.push(st.pop() & 0xffffffffL) // i32.reinterpret_f32: lane already bits
        case 0xbd => // i64.reinterpret_f64: identity on lanes
        case 0xbe => // f32.reinterpret_i32: identity
        case 0xbf => // f64.reinterpret_i64: identity
        // sign extension
        case 0xc0 => st.push(b32(st.pop().toByte.toInt))
        case 0xc1 => st.push(b32(st.pop().toShort.toInt))
        case 0xc2 => st.push(st.pop().toByte.toLong)
        case 0xc3 => st.push(st.pop().toShort.toLong)
        case 0xc4 => st.push(st.pop().toInt.toLong)
        // 0xFC: saturating truncation + bulk memory
        case 0xfc00 => st.push(b32(satI32(pf(st.pop()).toDouble, signed = true)))
        case 0xfc01 => st.push(b32(satI32(pf(st.pop()).toDouble, signed = false)))
        case 0xfc02 => st.push(b32(satI32(pd(st.pop()), signed = true)))
        case 0xfc03 => st.push(b32(satI32(pd(st.pop()), signed = false)))
        case 0xfc04 => st.push(satI64(pf(st.pop()).toDouble, signed = true))
        case 0xfc05 => st.push(satI64(pf(st.pop()).toDouble, signed = false))
        case 0xfc06 => st.push(satI64(pd(st.pop()), signed = true))
        case 0xfc07 => st.push(satI64(pd(st.pop()), signed = false))
        case 0xfc0a => // memory.copy: same bounds/trap discipline as loads
          val len = st.pop().toInt.toLong & 0xffffffffL
          val src = addr(st.pop(), 0, 0); val dst = addr(st.pop(), 0, 0)
          if (src + len > mem.length || dst + len > mem.length)
            throw new Trap(s"out-of-bounds memory.copy of $len bytes")
          System.arraycopy(mem, src, mem, dst, len.toInt)
        case 0xfc0b =>
          val len = st.pop().toInt.toLong & 0xffffffffL
          val v = st.pop().toByte
          val dst = addr(st.pop(), 0, 0)
          if (dst + len > mem.length)
            throw new Trap(s"out-of-bounds memory.fill of $len bytes")
          java.util.Arrays.fill(mem, dst, dst + len.toInt, v)
        case other =>
          throw new UnsupportedOperationException(f"WASM opcode 0x$other%02x not supported")
      }
      Int.MinValue
    }

    private def callInto(f: Int, st: Stack): Unit = {
      val ft = module.funcType(f)
      val args = new Array[Long](ft.params.size)
      var i = args.length - 1
      while (i >= 0) { args(i) = st.pop(); i -= 1 }
      val r = invoke(f, args)
      if (ft.results.nonEmpty) st.push(r)
    }

    @inline private def addr(base: Long, offset: Long, width: Int): Int = {
      val a = (base.toInt.toLong & 0xffffffffL) + offset // base is an unsigned i32
      if (a < 0 || a + width > mem.length)
        throw new Trap(s"out-of-bounds memory access at $a")
      a.toInt
    }

    private def ulongToDouble(v: Long): Double =
      if (v >= 0) v.toDouble
      else ((v >>> 1) | (v & 1L)).toDouble * 2.0

    private def truncToI32(d: Double, signed: Boolean, from: String): Int = {
      if (d.isNaN) throw new Trap(s"invalid conversion: NaN to i32")
      val t = if (d < 0) math.ceil(d) else math.floor(d)
      if (signed) {
        if (t < Int.MinValue.toDouble || t > Int.MaxValue.toDouble)
          throw new Trap(s"i32.trunc_${from}_s: overflow")
        t.toInt
      } else {
        if (t < 0 || t > 4294967295.0) throw new Trap(s"i32.trunc_${from}_u: overflow")
        t.toLong.toInt
      }
    }

    private def truncToI64(d: Double, signed: Boolean, from: String): Long = {
      if (d.isNaN) throw new Trap(s"invalid conversion: NaN to i64")
      val t = if (d < 0) math.ceil(d) else math.floor(d)
      if (signed) {
        if (t < -9.223372036854776e18 || t >= 9.223372036854776e18)
          throw new Trap(s"i64.trunc_${from}_s: overflow")
        t.toLong
      } else {
        if (t < 0 || t >= 1.8446744073709552e19) throw new Trap(s"i64.trunc_${from}_u: overflow")
        if (t < 9.223372036854776e18) t.toLong
        else (t - 9.223372036854776e18).toLong | Long.MinValue
      }
    }

    private def satI32(d: Double, signed: Boolean): Int =
      if (d.isNaN) 0
      else if (signed) math.max(Int.MinValue.toDouble, math.min(Int.MaxValue.toDouble, d)).toInt
      else math.max(0.0, math.min(4294967295.0, d)).toLong.toInt

    private def satI64(d: Double, signed: Boolean): Long =
      if (d.isNaN) 0L
      else if (signed) d.toLong // JVM toLong saturates
      else if (d <= 0) 0L
      else if (d >= 1.8446744073709552e19) -1L
      else if (d < 9.223372036854776e18) d.toLong
      else (d - 9.223372036854776e18).toLong | Long.MinValue
  }
}
