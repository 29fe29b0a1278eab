package graft

import graft.sql.GraftContext

/** WASM raw-numeric UDF execution, driven end-to-end through CREATE
  * FUNCTION DDL. The test module is the public sintau/exp2/log2/evalpoly
  * gist the reference's own wasm tests use
  * (gist.github.com/going-digital/02e46c44d89237c07bc99cd440ebfa43,
  * reference `src/wasm_udf/wasm.rs:822-925`) — hand-written f32 WASM with
  * loops, calls, a data segment, and polynomial evaluation over linear
  * memory, so reproducing its outputs exercises the parser, control flow,
  * memory, and the float instruction set at once. Expected values are the
  * reference test's own assertion table (ROUND(f(x) * 1000)).
  */
class WasmSpec extends SparkSpec {

  private val sintauHex =
    """0061736d01000000010d0260017d017d60037d7f7f017d03050400000001
      |0504010144440718030673696e746175000004657870320001046c6f6732
      |00020a8e01042901027d430000003f2202200020008e9322002002938b22
      |01932001964100411810032002200093980b1900200020008e2200934118
      |412c1003bc2000a84117746abe0b2501017f2000bc220141177641ff006b
      |b22001410974b3430000804f95412c41c4001003920b2201017d03402003
      |20009420012a0200922103200141046a220120026b0d000b20030b0b4a01
      |0041000b443fc76142d9e013414baa2ac273b2a63d4001c9407e95d0366f
      |f95f3c90f2533d2267773eac66313f1d00803ff725303d03fd3fbe17a6d1
      |3e4cdc34bfd382b83ffc888a37006a046e616d65011f04000673696e7461
      |7501046578703202046c6f673203086576616c706f6c7902370400030001
      |7801027831020468616c6601010001780202000178010278690304000178
      |010573746172740203656e640306726573756c74030901030100046c6f6f
      |70""".stripMargin.replaceAll("\\s", "")

  private def hexToB64(hex: String): String =
    java.util.Base64.getEncoder.encodeToString(
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)

  private lazy val ctx = new GraftContext(spark, tmpDir("graft-wasm"))

  private def createFn(name: String, entry: String, json: String): Unit =
    ctx.execute(s"CREATE OR REPLACE FUNCTION $name AS '$json'")

  private def fnJson(entry: String, inTypes: Seq[String], ret: String): String =
    s"""{"entrypoint":"$entry","language":"wasm","input_types":[${inTypes.map("\"" + _ + "\"").mkString(",")}],"return_type":"$ret","data":"${hexToB64(sintauHex)}","volatility":"immutable"}"""

  test("sintau/exp2/log2 reproduce the reference test vectors") {
    createFn("sintau", "sintau", fnJson("sintau", Seq("f32"), "f32"))
    createFn("exp2", "exp2", fnJson("exp2", Seq("f32"), "f32"))
    createFn("log2", "log2", fnJson("log2", Seq("f32"), "f32"))
    val rows = ctx.execute(
      """SELECT
        |  ROUND(sintau(v1) * 1000) AS sv1, ROUND(sintau(v2) * 1000) AS sv2,
        |  ROUND(exp2(v1) * 1000) AS ev1, ROUND(exp2(v2) * 1000) AS ev2,
        |  ROUND(log2(v1) * 1000) AS lv1, ROUND(log2(v2) * 1000) AS lv2
        |FROM (VALUES (CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT)),
        |             (CAST(1.2 AS FLOAT), CAST(2.3 AS FLOAT)),
        |             (CAST(3.3 AS FLOAT), CAST(4.3 AS FLOAT)),
        |             (CAST(5.4 AS FLOAT), CAST(2.5 AS FLOAT)),
        |             (CAST(1234.5 AS FLOAT), CAST(678.8 AS FLOAT))) AS d(v1, v2)
        |""".stripMargin)
      .collect().map(r => (0 until 6).map(r.getDouble).toList).toList
    // reference assertion table (wasm.rs:917-925)
    assert(rows === List(
      List(588.0, 951.0, 1072.0, 1149.0, -3322.0, -2322.0),
      List(951.0, 951.0, 2297.0, 4925.0, 263.0, 1202.0),
      List(951.0, 951.0, 9849.0, 19698.0, 1722.0, 2104.0),
      List(588.0, 0.0, 42224.0, 5657.0, 2433.0, 1322.0),
      List(0.0, -951.0, -0.0, -0.0, 10270.0, 9407.0)))
  }

  test("wasm UDFs survive a context restart (persisted, re-registered)") {
    createFn("sintau2", "sintau", fnJson("sintau", Seq("f32"), "f32"))
    val ctx2 = new GraftContext(spark, ctx.dataDir)
    val r = ctx2.execute("SELECT ROUND(sintau2(CAST(0.1 AS FLOAT)) * 1000) AS v")
      .collect()(0).getDouble(0)
    assert(r === 588.0)
  }

  test("NULL arguments yield NULL, not a trap") {
    createFn("sintau3", "sintau", fnJson("sintau", Seq("f32"), "f32"))
    val r = ctx.execute("SELECT sintau3(CAST(NULL AS FLOAT)) AS v").collect()(0)
    assert(r.isNullAt(0))
  }

  test("missing export and signature mismatch fail at CREATE time") {
    val noSuch = intercept[Exception] {
      createFn("nope", "no_such_fn", fnJson("no_such_fn", Seq("f32"), "f32"))
    }
    assert(noSuch.getMessage.contains("could not be located"), noSuch.getMessage)
    val badSig = intercept[Exception] {
      // sintau is (f32) -> f32, declared here as (f64) -> f64
      createFn("badsig", "sintau", fnJson("sintau", Seq("f64"), "f64"))
    }
    assert(badSig.getMessage.contains("signature"), badSig.getMessage)
    val badArity = intercept[Exception] {
      createFn("badarity", "sintau", fnJson("sintau", Seq("f32", "f32"), "f32"))
    }
    assert(badArity.getMessage.contains("signature"), badArity.getMessage)
  }

  test("DDL type names map onto WASM lanes (INT/BIGINT/REAL/DOUBLE)") {
    // REAL -> f32 passes the signature check against the same module
    createFn("sintau4", "sintau", fnJson("sintau", Seq("REAL"), "REAL"))
    val r = ctx.execute("SELECT ROUND(sintau4(CAST(0.25 AS FLOAT)) * 1000) AS v")
      .collect()(0).getDouble(0)
    assert(r === 1000.0) // sin(2*pi*0.25) = 1
    // unsupported DDL type is rejected with the reference's error shape
    val bad = intercept[Exception] {
      createFn("badtype", "sintau", fnJson("sintau", Seq("VARCHAR"), "f32"))
    }
    assert(bad.getMessage.contains("do not support data type"), bad.getMessage)
  }

  test("fuel limit traps a runaway loop instead of hanging the thread") {
    import graft.functions.wasm.Wasm
    // hand-assembled (func (export "spin") (param i32) (result i32)
    //   (loop (br 0)) i32.const 0) — the module wasmtime's fuel metering
    // exists for (reference src/wasm_udf/wasm.rs:84-241)
    val spinHex = "0061736d01000000" + "01060160017f017f" + "03020100" +
      "070801047370696e0000" + "0a0b01090003400c000b41000b"
    val bytes = spinHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val m = new Wasm.Module(bytes)
    val inst = new Wasm.Instance(m, fuelBudget = 100000L)
    val ex = intercept[Wasm.Trap](inst.invoke(m.exportedFunc("spin"), Array(0L)))
    assert(ex.getMessage.contains("fuel exhausted"), ex.getMessage)
    // the tank refills per TOP-LEVEL call (exhaustion isn't sticky):
    // many bounded calls on one instance each run under their own budget
    val sm = new Wasm.Module(
      sintauHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    val si = new Wasm.Instance(sm, fuelBudget = 1000L)
    val exp2 = sm.exportedFunc("exp2")
    (1 to 100).foreach { _ =>
      si.invoke(exp2, Array(java.lang.Float.floatToIntBits(1.5f).toLong))
    }
  }
}
