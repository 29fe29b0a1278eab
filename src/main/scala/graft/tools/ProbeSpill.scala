package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe: run the heavy operators under a CONSTRAINED
  * heap (set SPARK_DRIVER_MEM before scripts/run.sh) and report, per
  * query, wall time plus the executor-side pressure metrics — memory
  * bytes spilled (deserialized size pushed out of execution memory),
  * disk bytes spilled (what actually hit disk, post-serialization), and
  * peak execution memory. The evidence this produces: under a heap that
  * CANNOT hold the working set, the sort/aggregate/join pipelines
  * degrade to spilling and still complete with correct row counts —
  * the single-node stand-in for "an executor at 100 TB runs out of
  * memory mid-stage", which is survived by spilling, not OOM.
  *
  * Usage: SPARK_DRIVER_MEM=1200m scripts/run.sh graft.tools.ProbeSpill
  *          [sfDir] [query ...]
  */
object ProbeSpill {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // k=v args become session confs (Explain's convention) — e.g.
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1000000
    val (confArgs, nameArgs) = args.drop(1).partition(_.contains("="))
    val names = if (nameArgs.nonEmpty) nameArgs.toSeq else Seq(
      // external sort (forced distributed-rank scale path below),
      // wide hash aggregate, corpus shuffles, pair-join dedup, ANN scan
      "tx29_zipf_slope", "ev35_revenue_gini", "q46_equidepth_bins",
      "q01_pricing_summary", "q09_distinct_aggs", "dd3_dedup_minhash_lsh",
      "tx30_bpe_train", "sim3_ann_ivf", "dd8_dedup_semantic")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      // force the distributed-rank scale path so the probe exercises the
      // range-partitioned external sort, not the small-input window
      .config("graft.rank.smallBytes", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Sessions.tune(spark)
    confArgs.map(_.split("=", 2)).foreach { case Array(k, v) => spark.conf.set(k, v) }
    graft.Tables.register(spark, sfDir)

    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    val peakExec = new AtomicLong; val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakExec.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })

    val heap = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"[spill] heap=${heap}MiB cpus=$cpus sf=${new java.io.File(sfDir).getName}")
    println(f"${"query"}%-24s ${"sec"}%8s ${"rows"}%10s ${"memSpill"}%10s ${"diskSpill"}%10s ${"peakExec"}%10s ${"shufWrite"}%10s")
    def mb(v: Long): String = f"${v / 1048576.0}%.1fM"
    // Synthetic probes beyond SparkEntry.queries: the SCALE settings of
    // operators whose oracled QueryDef bakes small-corpus parameters.
    // p5's QueryDef fixes planesPerBand=6 (oracle parity) — quadratic
    // candidates at a 10× corpus by construction; the 100 TB setting
    // scales 2^B with the corpus (ProbeScale r17), which is what a
    // starved heap must be probed against.
    def p5ScaledB(b: Int): (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, d) => {
        import org.apache.spark.sql.functions.col
        val emb = graft.Tables.load(s, d, "embeddings")
        val edges = graft.ops.Embeddings.knnGraphBanded(emb, "vec_id", "embedding",
          k = 3, planesPerBand = b, bands = 3, dim = 64)
        val seeds = emb.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id"), col("label"))
        graft.ops.Graph.labelSpread(edges, "node_id", "neighbor_id",
          seeds, "vec_id", "label", iters = 3)
      }
    val synthetic = Map(
      "p5_scaled_b10" -> p5ScaledB(10),
      "p5_scaled_b8" -> p5ScaledB(8))

    names.foreach { name =>
      synthetic.get(name).orElse(graft.SparkEntry.queries.get(name)) match {
        case None => println(s"$name: unknown query")
        case Some(fn) =>
          memSpill.set(0); diskSpill.set(0); peakExec.set(0); shuffleWrite.set(0)
          val t0 = System.nanoTime()
          val outcome =
            try Right(fn(spark, sfDir).count())
            catch { case e: Throwable => Left(e.getClass.getSimpleName) }
          val dt = (System.nanoTime() - t0) / 1e9
          // listener delivery is async; give the bus a beat to drain
          // (listenerBus.waitUntilEmpty is private[spark]; a dev probe
          // doesn't need exactness beyond the settle window)
          Thread.sleep(800)
          outcome match {
            case Right(n) =>
              println(f"$name%-24s $dt%8.1f $n%10d ${mb(memSpill.get)}%10s ${mb(diskSpill.get)}%10s ${mb(peakExec.get)}%10s ${mb(shuffleWrite.get)}%10s")
            case Left(err) =>
              println(f"$name%-24s $dt%8.1f ${"FAIL:" + err}%s")
          }
      }
    }
    spark.stop()
  }
}
