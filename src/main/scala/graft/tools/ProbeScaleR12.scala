package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale probe for this round's operators: perceptual-hash near-dup
  * (phash band join — candidates grow as n²·bands/2¹⁶, the banding
  * calibration question at media scale), the k-NN graph build (bucket-
  * bounded self-join), LPA communities and personalized PageRank
  * (distributed loops forced), and the Mann–Whitney rank math (linear
  * shapes). Replicated docs get distinct payloads and embeddings get a
  * per-replica jitter so hash/signature distributions stay realistic
  * (identical payloads would collapse every replica into one bucket).
  */
object ProbeScaleR12 {
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
    val emb0 = graft.Tables.load(spark, sfDir, "embeddings")
    for (m <- Seq(1, mult)) {
      val docs = spark.range(m).crossJoin(docs0)
        .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
          concat(col("text"), lit(" rep"), col("id")).as("text"))
        .cache()
      val ev = spark.range(m).crossJoin(ev0)
        .select((col("event_id") + col("id") * 10000000L).as("event_id"),
          col("ts"), (col("user_id") + col("id") * 1000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .cache()
      val emb = spark.range(m).crossJoin(emb0)
        .select((col("vec_id") + col("id") * 1000000L).as("vec_id"),
          expr("transform(embedding, x -> x + cast(id as float) * 1e-3f)").as("embedding"))
        .cache()
      println(s"== x$m: docs ${docs.count()}, events ${ev.count()}, vecs ${emb.count()}")

      t(s"mm6 phash near-dup x$m") {
        graft.ops.Multimodal.phashNearDupPairs(
            graft.ops.Multimodal.asBinaryTable(docs, "doc_id", "text"), maxHamming = 64)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"sim9 knn graph x$m") {
        graft.ops.Embeddings.knnGraph(emb, "vec_id", "embedding",
            k = 3, planes = 6, dim = 64)
          .write.mode("overwrite").format("noop").save()
      }
      val edges = graft.ops.Graph.itemTransitionEdges(ev).localCheckpoint(false)
      t(s"gr9 LPA x$m (distributed loop)") {
        graft.ops.Graph.lpaCommunities(edges, "src", "dst", "w", iters = 4,
            localEdgeLimit = 0L)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"gr10 PPR x$m (distributed loop)") {
        graft.ops.Graph.personalizedPageRank(edges, "src", "dst", "w",
            seeds = Set(1L, 2L, 3L), iters = 10, localEdgeLimit = 0L)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"mm7 shared frames x$m") {
        graft.ops.Multimodal.sharedFramePairs(spark,
            graft.ops.Multimodal.asBinaryTable(docs, "doc_id", "text"))
          .write.mode("overwrite").format("noop").save()
      }
      t(s"ev33 dau/mau contribution explode x$m") {
        val a = ev.select(col("user_id"),
            expr("unix_micros(ts) div 86400000000L").as("d")).distinct()
        a.withColumn("x", explode(sequence(lit(0), lit(29))))
          .select(col("user_id"), (col("d") + col("x")).as("d"))
          .distinct()
          .groupBy("d").agg(count(lit(1)).as("mau"))
          .write.mode("overwrite").format("noop").save()
      }
      t(s"ev22 mann-whitney x$m") {
        graft.SparkEntry.queries // touch: linear-shape twin runs via the query below
        val base = ev.filter(col("event_type").isin("view", "purchase"))
          .select(date_trunc("day", col("ts")).as("day"),
            when(col("event_type") === "view", 1L).otherwise(0L).as("g"),
            round(col("value") * 1000).cast("long").as("vm"))
        val tv = base.groupBy("day", "vm")
          .agg(count(lit(1)).as("t"), sum("g").as("t1"))
        tv.groupBy("day").agg(sum("t").as("n"), sum("t1").as("n1"))
          .write.mode("overwrite").format("noop").save()
      }
      docs.unpersist(); ev.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
