package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale probe for the round-8 operators: PageRank (graph grows with
  * user replication — denser edges on the same 100 items), the binned
  * interval join (both sides ×N), BM25 retrieval and weighted sampling
  * (corpus ×N). Sub-quadratic wall-clock growth is the claim under test
  * — candidate generation must stay bin/term/key-bounded.
  */
object ProbeScaleR8 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ev0 = graft.Tables.load(spark, sfDir, "events")
    val docs0 = graft.Tables.load(spark, sfDir, "documents")
    for (m <- Seq(1, mult)) {
      val ev = spark.range(m).crossJoin(ev0)
        .select((col("event_id") + col("id") * 10000000L).as("event_id"),
          col("ts"), (col("user_id") + col("id") * 1000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .cache()
      val docs = spark.range(m).crossJoin(docs0)
        .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
          concat(col("text"), lit(" rep"), col("id")).as("text"),
          (col("n_chars") + col("id") % 7).as("n_chars"))
        .cache()
      println(s"== x$m: events ${ev.count()}, docs ${docs.count()}")
      t(s"gr1 pagerank x$m (distributed path)") {
        // localEdgeLimit=0 forces the iterative loop — the probe measures
        // the scale path, not the driver fast path
        graft.ops.Graph.pageRank(
          graft.ops.Graph.itemTransitionEdges(ev), "src", "dst", "w",
          iters = 10, localEdgeLimit = 0L)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"ev12 interval-join x$m") {
        val errors = ev.where(col("event_type") === "error")
          .select(col("event_id"), unix_micros(col("ts")).as("tus"))
          .withColumn("end_us", col("tus") + lit(600000000L))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(unix_micros(col("ts")).as("pts"))
        graft.ops.TimeSeriesOps.binnedIntervalJoin(
            errors, purchases, "tus", "end_us", "pts", 600000000L)
          .groupBy("event_id").count()
          .write.mode("overwrite").format("noop").save()
      }
      t(s"tx23 bm25 x$m") {
        graft.ops.TextAnalysis.bm25Search(docs, "doc_id", "text",
            Seq("hash", "join", "filter"), 20)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"tx22 weighted-sample x$m") {
        graft.ops.TextAnalysis.weightedSample(docs, "doc_id", "n_chars", 100, "samp")
          .write.mode("overwrite").format("noop").save()
      }
      ev.unpersist(); docs.unpersist()
    }
    spark.stop()
  }
}
