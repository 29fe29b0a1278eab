package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicate documents Nx with distinct ids and
  * time the dedup/similarity pipelines — the check that candidate
  * generation stays near-linear (LSH buckets / df-capped inverted index)
  * instead of quadratic as the corpus grows. */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.Tables.load(spark, sfDir, "documents")
    val n0 = docs0.count()
    // N shifted copies; suffix the text so copies are near-dups of their
    // original (keeps LSH bucket sizes realistic, not degenerate)
    val docs = spark.range(mult).crossJoin(docs0)
      .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
        concat(col("text"), lit(" rep"), col("id")).as("text"))
      .cache()
    val n = docs.count()
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(s"docs: $n0 -> $n (x$mult)")
    t(s"dd3 minhash-lsh x$mult")(
      graft.ops.TextDedup.minhashDedupPairs(docs, "doc_id", "text", 5, 16, 8, 0.8)
        .write.mode("overwrite").format("noop").save())
    t(s"dd1 exact x$mult")(
      graft.ops.TextDedup.exactDedup(docs, "doc_id", "text")
        .write.mode("overwrite").format("noop").save())
    t(s"dd2 ngram-jaccard x$mult")(
      graft.ops.TextDedup.jaccardPairs(docs, "doc_id", "text", 5, 0.8, 100)
        .write.mode("overwrite").format("noop").save())
    t(s"tx5 winnow x$mult")(
      graft.ops.TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 4, 8)
        .write.mode("overwrite").format("noop").save())
    t(s"tx13 seq-packing x$mult")(
      graft.ops.TextAnalysis.packSequences(docs, "doc_id", "text", 512)
        .write.mode("overwrite").format("noop").save())
    t(s"tx14 importance-weights x$mult")(
      graft.ops.TextAnalysis.importanceWeights(docs, "doc_id", "text",
          col("doc_id") % 7 === 0)
        .write.mode("overwrite").format("noop").save())
    t(s"tx15 lm-quality x$mult")(
      graft.ops.TextAnalysis.lmQualityScore(docs, "doc_id", "text")
        .write.mode("overwrite").format("noop").save())
    t(s"dd9 repeated-spans x$mult")(
      graft.ops.TextAnalysis.repeatedSpans(docs, "doc_id", "text", 8)
        .write.mode("overwrite").format("noop").save())
    val split = graft.ops.TextAnalysis.trainSplit(docs, "doc_id", "graft")
    t(s"tx8 contamination x$mult (exact)")(
      graft.ops.TextAnalysis.contaminationCheck(split, "doc_id", "text", "split", 5, 0.5)
        .write.mode("overwrite").format("noop").save())
    t(s"tx8 contamination x$mult (bloom-prefiltered)")(
      graft.ops.TextAnalysis.contaminationCheck(split, "doc_id", "text", "split", 5, 0.5,
          bloomPrefilter = true)
        .write.mode("overwrite").format("noop").save())
    t(s"dd10 chunk-dedup x$mult")(
      graft.ops.TextDedup.chunkDedup(docs, "doc_id", "text", 10)
        .write.mode("overwrite").format("noop").save())
    t(s"dd11 containment x$mult")(
      graft.ops.TextDedup.containmentPairs(docs, "doc_id", "text", 5, 0.8, 100)
        .write.mode("overwrite").format("noop").save())
    t(s"tx16 shard-shuffle x$mult")(
      graft.ops.TextAnalysis.shardShuffle(docs, "doc_id", "shuf")
        .write.mode("overwrite").format("noop").save())
    t(s"tx17 corpus-drift x$mult")(
      graft.ops.TextAnalysis.corpusDrift(
          docs.withColumn("source", concat(lit("s"), col("doc_id") % 20)), "source", "text")
        .write.mode("overwrite").format("noop").save())
    t(s"tx18 tfidf-topk x$mult")(
      graft.ops.TextAnalysis.tfIdfTopK(docs, "doc_id", "text", 5)
        .write.mode("overwrite").format("noop").save())
    t(s"tx19 bpe-pairs x$mult")(
      graft.ops.TextAnalysis.bpePairCounts(docs, "text", 50)
        .write.mode("overwrite").format("noop").save())
    t(s"tx20 domain-quota x$mult")(
      graft.ops.TextAnalysis.domainQuotaSample(
          docs.withColumn("source", concat(lit("s"), col("doc_id") % 20)),
          "doc_id", "source", 10)
        .write.mode("overwrite").format("noop").save())
    // embeddings: replicate with shifted ids; queries stay 10 vectors
    val em0 = graft.Tables.load(spark, sfDir, "embeddings")
    val em = spark.range(mult).crossJoin(em0)
      .select((col("vec_id") + col("id") * 1000000L).as("vec_id"), col("embedding"))
      .cache()
    println(s"vectors: ${em.count()}")
    t(s"sim2 lsh-ann x$mult")(
      graft.ops.Embeddings.annTopK(em, "vec_id", "embedding",
          col("vec_id") < 10, k = 3, planes = 6, dim = 64)
        .write.mode("overwrite").format("noop").save())
    t(s"sim3 ivf x$mult")(
      graft.ops.Embeddings.ivfTopK(em, "vec_id", "embedding",
          col("vec_id") < 10, k = 3, numCells = 8, nprobe = 2)
        .write.mode("overwrite").format("noop").save())
    t(s"sim4 pq x$mult")(
      graft.ops.Embeddings.pqTopK(em, "vec_id", "embedding",
          col("vec_id") < 10, k = 3, numSub = 4, subDim = 16,
          codebookSize = 8, candK = 10)
        .write.mode("overwrite").format("noop").save())
    t(s"sim5 ivfpq x$mult cells=${8 * mult} (scaled)")(
      graft.ops.Embeddings.ivfPqTopK(em, "vec_id", "embedding",
          col("vec_id") < 10, k = 3, numCells = 8 * mult, nprobe = 2,
          numSub = 4, subDim = 16, codebookSize = 8, candK = 10)
        .write.mode("overwrite").format("noop").save())
    // SemDeDup's scale knob: cells grow with the corpus so the per-cell
    // quadratic (N/K)² stays constant — probe both the fixed-cell
    // (deliberately quadratic) and scaled-cell (the 100 TB shape) plans
    t(s"dd8 semdedup x$mult cells=8 (fixed: quadratic)")(
      graft.ops.Embeddings.semDedup(em, "vec_id", "embedding",
          numCells = 8, threshold = 0.4)
        .write.mode("overwrite").format("noop").save())
    t(s"dd8 semdedup x$mult cells=${8 * mult} (scaled: linear)")(
      graft.ops.Embeddings.semDedup(em, "vec_id", "embedding",
          numCells = 8 * mult, threshold = 0.4)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
