package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Dev probe: single-threaded eval cost of the native text expressions. */
object ProbeExpr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    println(s"${texts.length} docs, total chars ${texts.map(_.length).sum}")
    val u = texts.map(UTF8String.fromString)
    def bench(label: String)(f: UTF8String => Any): Unit = {
      var best = Long.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        var i = 0
        while (i < u.length) { f(u(i)); i += 1 }
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"$label%-22s ${best / 1e6}%.1f ms single-thread")
    }
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.StringType
    val ref = BoundReference(0, StringType, nullable = false)
    val sh = graft.functions.TextExprs.ShingleHashSet(ref, 5)
    val mh = graft.functions.TextExprs.MinHashBandKeys(ref, 5, 16, 8)
    val sim = graft.functions.TextExprs.SimHash64(ref, weighted = false)
    val row = new GenericInternalRow(1)
    bench("shingle_hash_set")(t => { row.update(0, t); sh.eval(row) })
    bench("minhash_band_keys")(t => { row.update(0, t); mh.eval(row) })
    bench("simhash64")(t => { row.update(0, t); sim.eval(row) })
    spark.stop()
  }
}
