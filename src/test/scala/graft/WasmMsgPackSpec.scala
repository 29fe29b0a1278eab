package graft

import graft.sql.GraftContext

/** wasmMessagePack UDF execution end-to-end through CREATE FUNCTION DDL
  * (reference `src/wasm_udf/wasm.rs:84-241`). The test module is
  * hand-assembled below (see [[WasmMsgPackSpec.moduleBytes]]): a bump
  * allocator plus guest functions that genuinely parse/emit the msgpack
  * framing the ABI mandates — fixarray-1 argument lists, fixstr/str8
  * strings, bool bytes, uint64/int64 big-endian ints — so the buffer
  * protocol (alloc → write framed args → call → read framed result →
  * dealloc) is exercised against real guest-side decoding, not an echo.
  */
class WasmMsgPackSpec extends SparkSpec {
  import WasmMsgPackSpec._

  private lazy val ctx = new GraftContext(spark, tmpDir("graft-mp"))

  private def fnJson(entry: String, inTypes: Seq[String], ret: String,
                     b64: String = moduleB64): String =
    s"""{"entrypoint":"$entry","language":"wasmMessagePack","input_types":[${
      inTypes.map("\"" + _ + "\"").mkString(",")}],"return_type":"$ret","data":"$b64","volatility":"immutable"}"""

  private def createFn(name: String, entry: String, inTypes: Seq[String], ret: String,
                       b64: String = moduleB64): Unit =
    ctx.execute(s"CREATE OR REPLACE FUNCTION $name AS '${fnJson(entry, inTypes, ret, b64)}'")

  test("TEXT: rev reverses strings (fixstr and str8 encodings both ways)") {
    createFn("rev", "rev", Seq("text"), "text")
    val long = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars -> str8
    val rows = ctx.execute(
      s"SELECT rev(s) AS r FROM VALUES ('hello graft'), ('$long'), ('') AS t(s)")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("tfarg olleh", long.reverse, ""))
  }

  test("BOOLEAN: til negates through guest-side c2/c3 handling") {
    createFn("til", "til", Seq("boolean"), "boolean")
    val rows = ctx.execute(
      "SELECT til(b) AS r FROM VALUES (true), (false) AS t(b)")
      .collect().map(_.getBoolean(0)).toSeq
    assert(rows === Seq(false, true))
  }

  test("TIMESTAMP: addhour adds 3600e9 ns via big-endian i64 in guest memory") {
    createFn("addhour", "addhour", Seq("timestamp"), "timestamp")
    val r = ctx.execute(
      """SELECT addhour(TIMESTAMP '2024-01-01 00:00:00') = TIMESTAMP '2024-01-01 01:00:00' AS eq,
        |       addhour(TIMESTAMP '2024-06-30 23:30:00') = TIMESTAMP '2024-07-01 00:30:00' AS eq2
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("DECIMAL and DATE round-trip the reference's value coding via ident") {
    createFn("identd", "ident", Seq("decimal(10,2)"), "decimal(10,2)")
    createFn("identdt", "ident", Seq("date"), "date")
    val r = ctx.execute(
      """SELECT identd(CAST(1234.56 AS DECIMAL(10,2))) AS d,
        |       identd(CAST(-99.99 AS DECIMAL(10,2))) AS dn,
        |       identdt(DATE '2024-02-29') AS dd
        |""".stripMargin).collect()(0)
    assert(r.getDecimal(0) === new java.math.BigDecimal("1234.56"))
    assert(r.getDecimal(1) === new java.math.BigDecimal("-99.99"))
    assert(r.getDate(2).toString === "2024-02-29")
  }

  test("NULL arguments yield NULL without reaching the guest") {
    createFn("rev2", "rev", Seq("text"), "text")
    val r = ctx.execute("SELECT rev2(CAST(NULL AS STRING)) AS r").collect()(0)
    assert(r.isNullAt(0))
  }

  test("functions survive a context restart (persisted, re-registered)") {
    createFn("rev3", "rev", Seq("text"), "text")
    val ctx2 = new GraftContext(spark, ctx.dataDir)
    val r = ctx2.execute("SELECT rev3('abc') AS r").collect()(0).getString(0)
    assert(r === "cba")
  }

  test("result/declared type mismatch fails with the reference's error shape") {
    // guest returns a msgpack string; declared BIGINT -> decode must complain
    createFn("revbad", "rev", Seq("text"), "bigint")
    val e = intercept[Exception](ctx.execute("SELECT revbad('abc') AS r").collect())
    assert(rootMessages(e).exists(_.contains("Expected to find i64 value")), e.getMessage)
  }

  test("a guest trap (unexpected argument encoding) reports an invocation error") {
    // rev expects a string arg; feeding an int drives the guest to `unreachable`
    createFn("revtrap", "rev", Seq("bigint"), "text")
    val e = intercept[Exception](ctx.execute("SELECT revtrap(12345) AS r").collect())
    assert(rootMessages(e).exists(_.contains("Error invoking WASM UDF")), e.getMessage)
  }

  test("module without the alloc export is rejected at CREATE time") {
    val e = intercept[Exception](
      createFn("noalloc", "rev", Seq("text"), "text", moduleB64NoAlloc))
    assert(rootMessages(e).exists(_.contains("could not be located")), e.getMessage)
    assert(!ctx.catalog.functions.contains("noalloc"), "rejected function must not persist")
  }

  test("unsupported declared types are rejected with the reference's message") {
    val e = intercept[Exception](createFn("badt", "rev", Seq("interval"), "text"))
    assert(rootMessages(e).exists(
      _.contains("UDFs with language 'wasmMessagePack' do not support data type")), e.getMessage)
  }

  private def rootMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
}

/** Delegates to the main-scope sample module (shared with the
  * throughput probe graft.tools.ProbeWasm). */
object WasmMsgPackSpec {
  lazy val moduleBytes: Array[Byte] = graft.functions.wasm.SampleModules.moduleBytes
  lazy val moduleB64: String = graft.functions.wasm.SampleModules.moduleB64
  lazy val moduleB64NoAlloc: String = graft.functions.wasm.SampleModules.moduleB64NoAlloc
}
