package graft.streaming

import graft.lake.GraftTable
import graft.sync.SyncMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}

/** Structured Streaming operators: the streaming twins of the batch event
  * queries (graft.queries.Events) plus the continuous CDC-upsert path —
  * `readStream → transform → writeStream`, watermarks for late data,
  * `foreachBatch` for merge sinks. The reference has no stream engine
  * (SURVEY §2.9); its pull-based buffered CDC ingestion maps exactly onto
  * micro-batch `foreachBatch` upserts.
  */
object StreamingOps {

  /** Tumbling-window counts/sums per event_type with a watermark for late
    * data. Works on any streaming DataFrame with (ts TIMESTAMP,
    * event_type STRING, value DOUBLE). */
  def tumblingAgg(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** NATIVE session windows — Spark's `session_window(ts, gap)`
    * aggregation: gap-based sessions maintained entirely by the engine's
    * windowing state (merging on overlap, closing on watermark), the
    * declarative sibling of `StatefulSessions.sessionize`'s custom
    * flatMapGroupsWithState. Same semantics for in-order data (a session
    * ends after `gap` of per-key silence); prefer THIS form when the
    * per-session output is an aggregate the engine can fold — custom
    * state is only for logic aggregation can't express. Emits
    * (user_id, session_start, session_end, n_events, total_value) on
    * session close.
    */
  def sessionWindowAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming OHLC downsampling — the continuous twin of batch ev7:
    * per (key, tumbling window) first/last/min/max value, with open and
    * close picked by min_by/max_by on the SHARED guarded key builder
    * (TimeSeriesOps.ohlcKey — negative epoch-µs/id raise loudly instead
    * of silently flipping the order; the id column must be integral so
    * the pad never truncates). One watermarked windowed aggregation —
    * no per-key sort, no custom state. */
  def ohlcStream(events: DataFrame, keyCol: String, idCol: String,
                 window: String, watermark: String): DataFrame = {
    val k = graft.ops.TimeSeriesOps.ohlcKey(col("ts"),
      graft.ops.TextDedup.longId(events, idCol, "ohlcStream"))
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col(keyCol))
      .agg(min_by(col("value"), k).as("open"), max_by(col("value"), k).as("close"),
        min("value").as("low"), max("value").as("high"), count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol),
        col("open"), col("close"), col("low"), col("high"), col("n"))
  }

  /** Sliding-window counts/sums per event_type: windows of `window` width
    * every `slide`, watermarked. Each event lands in window/slide
    * overlapping windows — Spark expands them before the one keyed
    * shuffle, so the scale cost is a ×(window/slide) row blow-up, not
    * extra shuffles; keep the ratio small at 100 TB. */
  def slidingAgg(events: DataFrame, window: String, slide: String,
                 watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup — the continuous twin of dd1: emit ONE event
    * per key (e.g. content digest; which duplicate survives is
    * batch-order-dependent), with state expired past the watermark so the
    * dedup map is bounded by the lateness horizon rather than the full
    * history. At 100 TB/day this is the property that makes streaming
    * dedup feasible at all: state is O(keys per watermark window), not
    * O(keys ever). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-duplicate suppression — the streaming twin of the
    * batch dd3 candidate generator / `TextDedup.nearDupSurvivors`, using
    * the same in-row MinHashBandKeys signature expression. Every
    * document contributes one row per LSH band bucket; a
    * transformWithState processor keyed on the bucket assigns each
    * bucket an OWNER — the first micro-batch to touch the bucket wins,
    * with ties INSIDE a batch resolved by the (event time, doc id)
    * total order — and a document survives iff it owns every one of its
    * buckets. Ownership is deterministic given a batch sequence and
    * two near-dups can never suppress each other both ways; but unlike
    * the batch twin (global MIN doc id per bucket), a LATE-arriving
    * earlier-timestamped document cannot reclaim a bucket an earlier
    * batch already assigned — append-mode streams cannot retract, so
    * arrival order is the honest streaming semantic. State is one long
    * per live bucket. Emits surviving (doc id, event time) rows once
    * the watermark closes their window.
    */
  def nearDupDedupStream(docs: DataFrame, idCol: String, textCol: String,
                         tsCol: String, watermark: String,
                         n: Int = 5, k: Int = 16, bands: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val spark = docs.sparkSession
    import spark.implicits._
    // cheap word-count predicate, never a filter on the signature output
    // (that would re-evaluate the whole k-by-md5 projection inside the
    // scan — same reasoning as the batch pipelines); the bucket null
    // filter after explode_outer drops any residual null-signature rows
    val withBands = docs
      .filter(size(split(col(textCol), " ")) >= n)
      .withWatermark(tsCol, watermark)
      .withColumn("__bks",
        graft.functions.TextExprs.minhash_band_keys(col(textCol), n, k, bands))
      .select(graft.ops.TextDedup.longId(docs, idCol, "nearDupDedupStream").as("doc_id"),
        col(tsCol).as("__ts"),
        explode_outer(col("__bks")).as("__bucket"))
      .filter(col("__bucket").isNotNull)
      .as[(Long, java.sql.Timestamp, Long)]
    // transformWithState (requires the RocksDB state store provider) with
    // the event-time-column overload: the operator re-declares "__ts" as
    // event time downstream, which is what makes a stateful aggregation
    // AFTER custom state legal — flatMapGroupsWithState cannot chain.
    val owned = withBands
      .groupByKey(_._3)
      .transformWithState(new BucketOwnerProcessor(), "_2", OutputMode.Append())
      .toDF("doc_id", "__ts", "__own")
    owned
      .groupBy(col("doc_id"), window(col("__ts"), "1 second").as("__w"))
      .agg(min(col("__own")).as("__all_own"))
      .filter(col("__all_own"))
      .select(col("doc_id"), col("__w.start").as("ts"))
  }

  /** Streaming MEDIA near-dup suppression — the online twin of the batch
    * mm6 perceptual-hash pipeline and the binary-payload sibling of
    * `nearDupDedupStream`: each arriving payload's 64-bit dHash
    * (`Multimodal.phash64`, native expression) emits its 4×16-bit LSH
    * band buckets as longs (band index ⊕ band bits — bucket ids never
    * collide across bands), a bucket is owned by its FIRST claimant
    * (per-bucket `transformWithState`, ONE long per live bucket,
    * event-time timer cleanup), and a document survives iff it owns ALL
    * its buckets — byte-identical payloads (and, with a real decoder,
    * near-identical frames) collapse to the first arrival, cross-batch.
    * The per-doc aggregation legally chains because the state operator
    * re-declares event time. Emits (doc_id, ts) survivors.
    */
  def phashDedupStream(media: DataFrame, idCol: String, tsCol: String,
                       watermark: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val spark = media.sparkSession
    import spark.implicits._
    val withBands = media
      .withWatermark(tsCol, watermark)
      .withColumn("__ph", graft.ops.Multimodal.phash64(col("payload")))
      .select(graft.ops.TextDedup.longId(media, idCol, "phashDedupStream").as("doc_id"),
        col(tsCol).as("__ts"),
        explode(expr("transform(sequence(0, 3), b -> " +
          "b * 65536L + cast(conv(substring(__ph, b * 16 + 1, 16), 2, 10) as bigint))"))
          .as("__bucket"))
      .as[(Long, java.sql.Timestamp, Long)]
    val owned = withBands
      .groupByKey(_._3)
      .transformWithState(new BucketOwnerProcessor(), "_2", OutputMode.Append())
      .toDF("doc_id", "__ts", "__own")
    owned
      .groupBy(col("doc_id"), window(col("__ts"), "1 second").as("__w"))
      .agg(min(col("__own")).as("__all_own"))
      .filter(col("__all_own"))
      .select(col("doc_id"), col("__w.start").as("ts"))
  }

  /** Streaming CHUNK-level exact dedup — the online twin of the batch C4
    * duplicate-span removal (dd10): arriving documents are cut into
    * non-overlapping `chunkWords`-word chunks in-row, each chunk's 64-bit
    * content hash claims a first occurrence via per-digest
    * transformWithState (state = ONE packed long per live digest,
    * TTL-bounded), and a chunk survives iff this row IS the stored first
    * occurrence — later arrivals of the same content, same batch or any
    * later batch, are dropped. Documents are reassembled from surviving
    * chunks per event-time window. Arrival order decides survivors
    * (append streams cannot retract), ties inside a batch by
    * (event time, doc id, chunk idx). Emits
    * (doc_id, ts, n_chunks, n_kept, clean_text).
    */
  def chunkDedupStream(docs: DataFrame, idCol: String, textCol: String,
                       tsCol: String, watermark: String,
                       chunkWords: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val docId = graft.ops.TextDedup.longId(docs, idCol, "chunkDedupStream")
    val spark = docs.sparkSession
    import spark.implicits._
    // null-text docs carry no chunks: dropped here explicitly (the batch
    // twin keeps them as empty rows; an append stream row with no event
    // content has nothing to window on)
    val chunks = docs
      .filter(col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(docId.as("doc_id"), col(tsCol).as("__ts"),
        split(col(textCol), " ").as("w"))
      .select(col("doc_id"), col("__ts"),
        posexplode(expr(
          s"transform(sequence(0, (size(w) + ${chunkWords - 1}) DIV $chunkWords - 1), " +
            s"i -> array_join(slice(w, i * $chunkWords + 1, $chunkWords), ' '))"))
          .as(Seq("idx", "chunk")))
      .select(xxhash64(col("chunk")).as("__h"), col("doc_id"), col("__ts"),
        col("idx"), col("chunk"))
      .as[(Long, Long, java.sql.Timestamp, Int, String)]
    val owned = chunks
      .groupByKey(_._1)
      .transformWithState(new ChunkOwnerProcessor(), "_2", OutputMode.Append())
      .toDF("doc_id", "__ts", "idx", "chunk", "kept")
    owned
      .groupBy(col("doc_id"), window(col("__ts"), "1 second").as("__w"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(" +
          "CASE WHEN kept THEN struct(idx, chunk) END)), x -> x.chunk), ' ')")
          .as("clean_text"))
      .select(col("doc_id"), col("__w.start").as("ts"),
        col("n_chunks"), col("n_kept"), col("clean_text"))
  }

  /** Streaming SEMANTIC dedup — the online twin of the batch SemDeDup
    * (dd8), in the offline-train / online-serve split production ANN
    * systems run: cells come from a FIXED pre-trained IVF index
    * (`Embeddings.trainIndex`), each arriving vector is assigned in-row
    * against the plan-baked centroids (zero shuffle), and a
    * transformWithState processor keyed on the cell holds up to
    * `maxReps` representative vectors — a new arrival is suppressed
    * (kept = false) iff its exact quantized cosine against ANY stored
    * representative reaches `threshold`, else it becomes a
    * representative itself while capacity remains. State is bounded by
    * maxReps × dim longs per cell NO MATTER the stream length — the
    * property that keeps an online dedup index feasible at 100 TB/day;
    * once a cell is full, novel vectors still pass through (kept = true)
    * but stop enrolling, the documented bounded-state trade. Arrival
    * order decides survivors (append-mode streams cannot retract), ties
    * inside a batch by (event time, vec id). Emits (vec_id, ts, kept).
    */
  def semanticDedupStream(vecs: DataFrame, idCol: String, vecCol: String,
                          tsCol: String, watermark: String,
                          cents: Array[(Long, Array[Long])],
                          threshold: Double, maxReps: Int = 128): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    require(cents.nonEmpty,
      "semanticDedupStream needs a non-empty trained index (Embeddings.trainIndex " +
        "on an empty corpus returns no centroids)")
    val spark = vecs.sparkSession
    import spark.implicits._
    val assigned = vecs
      .withWatermark(tsCol, watermark)
      .withColumn("__qe", graft.ops.Embeddings.quantize(col(vecCol)))
      .withColumn("__cell", element_at(
        graft.functions.VectorFunctions.nearest_cells(col("__qe"), cents, 1), 1))
      .select(col("__cell"),
        graft.ops.TextDedup.longId(vecs, idCol, "semanticDedupStream").as("vec_id"),
        col(tsCol).as("__ts"), col("__qe"))
      .as[(Long, Long, java.sql.Timestamp, Array[Long])]
    assigned
      .groupByKey(_._1)
      .transformWithState(new CellRepsProcessor(threshold, maxReps),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("vec_id", "ts", "kept")
  }

  /** Streaming heavy hitters — the online twin of tx21: per event-time
    * window, the Misra–Gries frequent-items summary of the arriving
    * corpus. The sketch is a mergeable TypedImperativeAggregate, so it
    * runs INSIDE the ordinary watermarked windowed aggregation — no
    * custom state processor; streaming state per live window is the
    * serialized ≤capacity-counter buffer, not the vocabulary. When the
    * window's distinct vocabulary stays ≤ capacity the counters are
    * exact counts (no decrement ever fires); past it, the tx21
    * guarantees apply per window. Emits (win_start,
    * array<struct<item, est>>) once the watermark closes the window. */
  def heavyHittersStream(docs: DataFrame, textCol: String, tsCol: String,
                         watermark: String, windowLen: String,
                         capacity: Int): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("__ts"), explode(split(col(textCol), " ")).as("word"))
      .groupBy(window(col("__ts"), windowLen))
      .agg(graft.functions.MisraGriesAggregate.misra_gries(col("word"), capacity).as("top"))
      .select(col("window.start").as("win_start"), col("top"))

  /** Streaming approximate distinct count — the online twin of q42's KMV
    * (bottom-k) sketch: per event-time window, the k smallest distinct
    * md5 digests of the arriving keys. MinKMd5Aggregate is mergeable, so
    * like heavyHittersStream it runs INSIDE the ordinary watermarked
    * windowed aggregation — no custom state processor, state per live
    * window = one ≤k-digest buffer regardless of how many keys arrive.
    * The estimate is q42's exact-Int64 formula ((k−1)·2⁵² div kth-hash
    * prefix, exact count below k), so a closed window's estimate is
    * bit-identical to the batch query over the same rows — asserted in
    * StreamingSpec. Emits (win_start, n_distinct_est). */
  def approxDistinctStream(events: DataFrame, keyCol: String, tsCol: String,
                           watermark: String, windowLen: String,
                           k: Int): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("__ts"), col(keyCol).cast(StringType).as("__k"))
      .groupBy(window(col("__ts"), windowLen))
      .agg(graft.functions.MinKMd5Aggregate.min_k_md5(col("__k"), k).as("sk"))
      .select(col("window.start").as("win_start"),
        expr(s"CASE WHEN size(sk) < $k THEN CAST(size(sk) AS BIGINT) " +
          s"ELSE ${k - 1}L * 4503599627370496L div CAST(conv(substring(element_at(sk, $k), 1, 13), 16, 10) AS BIGINT) END")
          .as("n_distinct_est"))

  /** Streaming event-transition matrix — the online twin of batch ev10:
    * per-user last-event state turns an append stream into (prev_type →
    * next_type, gap) transition rows, aggregated per event-time window.
    * LAG does not exist in streaming; the equivalent is one small
    * ValueState (last event's micros + type) per live user, processed in
    * (event time, event id) order inside each micro-batch so results are
    * deterministic under intra-batch reordering. A row REGRESSING behind
    * the stored last event (late beyond the batch's own sort, i.e. past
    * the watermark) is dropped rather than emitted out of order — the
    * same append-mode no-retraction trade the dedup streams document.
    * State expires a fixed TTL after the user's first event (absolute,
    * not idle-extended — the bounded-state policy shared by every
    * processor here). Emits (window_start, prev_type, next_type, n,
    * total_gap_us).
    */
  def transitionMatrixStream(events: DataFrame, userCol: String,
                             typeCol: String, tsCol: String, idCol: String,
                             watermark: String,
                             windowLen: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("u"), col(typeCol).as("t"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("eid"))
      .as[(Long, String, java.sql.Timestamp, Long)]
    val trans = typed
      .groupByKey(_._1)
      .transformWithState(new LastEventProcessor(), "_4", OutputMode.Append())
      .toDF("prev_type", "next_type", "gap_us", "__ts")
    trans
      .groupBy(window(col("__ts"), windowLen).as("__w"),
        col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"), sum("gap_us").as("total_gap_us"))
      .select(col("__w.start").as("window_start"), col("prev_type"),
        col("next_type"), col("n"), col("total_gap_us"))
  }

  /** Streaming FUNNEL — the online twin of batch ev8: per user, ONE
    * monotone stage pointer (none → view → click → purchase, strict
    * time-order advance with the same strict-inequality rule as ev8's
    * min-time chain), held in a 3-long ValueState; every stage ADVANCE
    * emits an event-time row, and a windowed aggregation counts stage
    * entries + conversion latency per window. On in-order data the
    * all-time stage totals equal ev8's counts exactly (each user enters
    * each stage at most once). Out-of-order rows that would regress the
    * pointer are dropped (append no-retraction, the shared policy).
    * Emits (window_start, n_view, n_click, n_purchase, total_convert_us).
    */
  def funnelStream(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String, watermark: String,
                   windowLen: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("u"), col(typeCol).as("t"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("eid"))
      .as[(Long, String, java.sql.Timestamp, Long)]
    val adv = typed
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor(), "_3", OutputMode.Append())
      .toDF("stage", "gap_us", "__ts")
    adv
      .groupBy(window(col("__ts"), windowLen).as("__w"))
      .agg(sum(when(col("stage") === 1, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("stage") === 2, 1L).otherwise(0L)).as("n_click"),
        sum(when(col("stage") === 3, 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("stage") === 3, col("gap_us")).otherwise(0L)).as("total_convert_us"))
      .select(col("__w.start").as("window_start"), col("n_view"), col("n_click"),
        col("n_purchase"), col("total_convert_us"))
  }

  /** Streaming rolling z-score anomaly flags — the online twin of batch
    * ev13: per user, flag a value whose deviation from the trailing
    * `windowN`-observation mean exceeds `zNum` standard deviations,
    * compared entirely in exact Int64 on milli-unit values
    * ((n·x − m)² > z²·(n·s2 − m²) — no float variance to drift between
    * batch and stream). The trailing window needs the last windowN−1
    * values per user: ONE ValueState ring (≤ windowN−1 longs + the
    * last-seen (micros, id) ordering key), processed in (event time, id)
    * order inside each micro-batch; rows regressing behind the stored
    * last event are dropped (append-mode no-retraction, the shared
    * policy). State expires `stateTtlMs` after the user's first event.
    * Emits flagged rows (user_id, event_id, vm, ts).
    */
  def anomalyStream(events: DataFrame, userCol: String, valueCol: String,
                    tsCol: String, idCol: String, watermark: String,
                    windowN: Int = 24, zNum: Long = 3L,
                    stateTtlMs: Long = 24 * 3600 * 1000L): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("u"),
        floor(col(valueCol) * lit(1000.0) + lit(0.5)).cast("long").as("vm"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("eid"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new RollingZScoreProcessor(windowN, zNum, stateTtlMs),
        "_4", OutputMode.Append())
      .toDF("user_id", "event_id", "vm", "ts")
  }

  /** Streaming EWMA — the online twin of batch ev15: per user, the
    * α = 1/2 exponentially-weighted moving average of the last `span`
    * milli-unit observations, power-of-two weights and one truncating
    * integer division per row, so emitted values are bit-identical to
    * the batch window formula over the same rows (StreamingSpec
    * asserts it). LAG does not exist in streaming; the equivalent is
    * one ValueState ring of the last span−1 values per live user (the
    * anomalyStream pattern: (event time, id)-ordered intra-batch
    * processing, rows regressing behind the stored last event dropped,
    * absolute TTL from the user's first event).
    * Emits (user_id, event_id, ewma_milli, ts) per surviving row. */
  def ewmaStream(events: DataFrame, userCol: String, valueCol: String,
                 tsCol: String, idCol: String, watermark: String,
                 span: Int = 8,
                 stateTtlMs: Long = 24 * 3600 * 1000L): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("u"),
        round(col(valueCol) * 1000).cast("long").as("vm"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("eid"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor(span, stateTtlMs),
        "_4", OutputMode.Append())
      .toDF("user_id", "event_id", "ewma_milli", "ts")
  }

  /** Streaming quantile estimates — q47's KLL sketch inside the ordinary
    * watermarked windowed aggregation (the approxDistinctStream /
    * heavyHittersStream pattern): state per live window is one KLL
    * binary (a few KB at k=200) regardless of how many values arrive,
    * and the sketch is mergeable so micro-batches combine exactly like
    * map-side partials. Estimates inherit KLL's rank-error guarantee
    * (±1.65% at k=200), not run-determinism — the same trade the batch
    * q47 oracle asserts. Emits (win_start, q_est ARRAY<BIGINT>) per
    * closed window, one element per requested rank. */
  def quantileStream(events: DataFrame, valueCol: String, tsCol: String,
                     watermark: String, windowLen: String,
                     ranks: Seq[Double], k: Int = 200): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("__ts"), col(valueCol).cast("long").as("__v"))
      .groupBy(window(col("__ts"), windowLen))
      .agg(graft.functions.KllFunctions.kll_sketch(col("__v"), k).as("sk"))
      .select(col("window.start").as("win_start"),
        graft.functions.KllFunctions.kll_quantiles(col("sk"), ranks).as("q_est"))

  /** Streaming CUSUM change-point flags — the online twin of batch ev17.
    * The batch query evaluates the closed form S = P − running-min(P);
    * the stream runs the equivalent clamped recursion
    * S_i = max(0, S_{i−1} + (x_i − target)) directly, so state is O(1):
    * ONE Long accumulator (plus the last-seen ordering key) per live
    * user — the cheapest state of any processor here. Same intra-batch
    * (event time, id) ordering, late-row drop, and absolute TTL as the
    * EWMA/anomaly rings; flagged rows are bit-identical to the batch
    * query over the same input. Emits (user_id, event_id, cusum, ts)
    * for rows with S ≥ h. */
  def cusumStream(events: DataFrame, userCol: String, valueCol: String,
                  tsCol: String, idCol: String, watermark: String,
                  target: Long, h: Long,
                  stateTtlMs: Long = 24 * 3600 * 1000L): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("u"),
        round(col(valueCol) * 1000).cast("long").as("vm"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("eid"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new CusumProcessor(target, h, stateTtlMs),
        "_4", OutputMode.Append())
      .toDF("user_id", "event_id", "cusum", "ts")
  }

  /** Watermarked stream-stream interval join: each left event picks up
    * the right-side rows with the same key whose timestamp lies in
    * [left.ts - lookback, left.ts]. Both sides buffer only up to their
    * watermark + interval bound — the state-bounded streaming analog of
    * the batch as-of join (ev4). */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         lookback: String, watermark: String): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("rts", watermark).as("r")
    l.join(r,
        col(s"l.$key") === col(s"r.$key") &&
          col("r.rts") >= col("l.ts") - expr(s"INTERVAL $lookback") &&
          col("r.rts") <= col("l.ts"))
      .drop(col(s"r.$key"))
  }

  /** Streaming twin of `TextDedup.incrementalDedup`: continuous-ingest
    * dedup of an arriving document stream against a STATIC corpus index
    * — verdict exact/near/new per doc, match_id = min matching corpus
    * id. The 100 TB shape: both legs are STREAM-STATIC joins, which are
    * stateless (each micro-batch probes the corpus-side index; nothing
    * accumulates), and the only stateful operator is the per-doc
    * verdict aggregation, bounded by docs in flight inside the
    * watermark. The corpus index — digest → min-id and band bucket →
    * (cid, shingle set) — is exactly what `TextDedup.incrementalDedup`
    * builds batch-side, so verdicts are bit-equal to running the batch
    * op over the same increment (same md5 minhash spec, same verified
    * Jaccard, same precedence: exact beats near; within-stream
    * duplicates are out of scope, as in the batch twin).
    */
  def incrementalDedupStream(corpus: DataFrame, stream: DataFrame,
                             idCol: String, textCol: String, tsCol: String,
                             watermark: String, n: Int = 5, k: Int = 16,
                             bands: Int = 8, threshold: Double = 0.8): DataFrame = {
    val cid = graft.ops.TextDedup.longId(corpus, idCol, "incrementalDedupStream")
    val corpDigests = corpus
      .select(md5(col(textCol)).as("__h"), cid.as("__cid"))
      .groupBy("__h").agg(min("__cid").as("__exact"))
    val corpBuckets = corpus
      .filter(size(split(col(textCol), " ")) >= n)
      .select(cid.as("__cid"),
        graft.functions.TextExprs.minhash_band_keys(col(textCol), n, k, bands).as("__bks"),
        graft.functions.TextExprs.shingle_hash_set(col(textCol), n).as("__shs2"))
      .select(col("__cid"), col("__shs2"), explode_outer(col("__bks")).as("__bucket"))
      .filter(col("__bucket").isNotNull)
    val base = stream
      .withWatermark(tsCol, watermark)
      .select(graft.ops.TextDedup.longId(stream, idCol, "incrementalDedupStream").as("doc_id"),
        col(tsCol).as("__ts"), md5(col(textCol)).as("__h"),
        when(size(split(col(textCol), " ")) >= n,
          graft.functions.TextExprs.minhash_band_keys(col(textCol), n, k, bands))
          .as("__bks"),
        when(size(split(col(textCol), " ")) >= n,
          graft.functions.TextExprs.shingle_hash_set(col(textCol), n))
          .as("__shs1"))
      .join(corpDigests, Seq("__h"), "left") // stateless stream-static
      // explode_outer keeps bucket-less (short / exact-only) docs alive
      // with a null bucket that the candidate join simply fails to match
      .select(col("doc_id"), col("__ts"), col("__exact"), col("__shs1"),
        explode_outer(col("__bks")).as("__bucket"))
    val verified = base
      .join(corpBuckets, Seq("__bucket"), "left") // stateless stream-static
      .withColumn("__inter",
        size(array_intersect(col("__shs1"), col("__shs2"))).cast("double"))
      .withColumn("__near_cid",
        when(col("__cid").isNotNull && col("__exact").isNull &&
          col("__inter") / (size(col("__shs1")) + size(col("__shs2")) -
            col("__inter")) >= threshold, col("__cid")))
    verified
      .groupBy(col("doc_id"), window(col("__ts"), "1 second").as("__w"))
      .agg(first(col("__exact")).as("__e"), min(col("__near_cid")).as("__n"))
      .select(col("doc_id"), col("__w.start").as("ts"),
        when(col("__e").isNotNull, "exact")
          .when(col("__n").isNotNull, "near")
          .otherwise("new").as("verdict"),
        coalesce(col("__e"), col("__n")).as("match_id"))
  }

  /** Streaming twin of `Embeddings.knnGraphIncrement`: a vector feed
    * folds into a MAINTAINED kNN edge set, one increment per
    * micro-batch — the continuously-fresh ANN index. After every batch
    * the edge set is BIT-EQUAL to a full knnGraphBanded rebuild over
    * everything ingested so far — increments compose because each one
    * is rebuild-equal (StreamingSpec proves the 3-batch composition).
    * `onUpdate` receives the post-batch edge set (publish hook).
    *
    * CRASH RECOVERY — the checkpointDir contract is real, not just
    * source offsets: corpus + edges are persisted as parquet under
    * `<checkpointDir>/graft-state/v=<batchId>` with a commit marker
    * written LAST, and the stream recovers from the newest committed
    * state on restart. The protocol is idempotent against Spark's
    * replay-last-batch semantics: if the replayed batchId's state is
    * already committed, the batch is NOT re-applied — its state is
    * loaded instead (apply-or-load keyed by batchId, the standard
    * exactly-once foreachBatch pattern). Only the previous state is
    * retained (older versions are deleted), so storage is O(2·index).
    * The per-batch state write is O(corpus + edges) — for indexes where
    * that dominates, lower the trigger cadence; the increment itself
    * stays O(batch-touching pairs). */
  def knnGraphMaintainStream(vectors: DataFrame, idCol: String, vecCol: String,
                             k: Int, planesPerBand: Int, bands: Int, dim: Int,
                             initialCorpus: DataFrame, checkpointDir: String,
                             onUpdate: DataFrame => Unit,
                             trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    maintainedIndexStream(vectors, idCol, vecCol, k, planesPerBand, bands, dim,
      initialCorpus, checkpointDir, onUpdate, trigger) { (corpus, edges, batch) =>
      val b = batch.select(col(idCol), col(vecCol)).localCheckpoint(false)
      val e = graft.ops.Embeddings.knnGraphIncrement(edges, corpus, b,
        idCol, vecCol, k, planesPerBand, bands, dim)
      (corpus.unionByName(b), e)
    }

  /** Streaming twin of `Embeddings.knnGraphDelete`: a TOMBSTONE feed (ids
    * to remove) folds into the maintained (corpus, edges) index, one
    * delete-repair per micro-batch — never a rebuild: tombstoned nodes'
    * rows drop, and only survivors whose stored list referenced a
    * tombstone re-rank (reverse-kNN-bounded backfill through the banded
    * candidate join). After every batch the edge set is BIT-EQUAL to a
    * full knnGraphBanded rebuild over the surviving corpus
    * (StreamingSpec composes inserts + deletes across batches). Shares
    * knnGraphMaintainStream's crash-recovery state protocol under
    * `<checkpointDir>/graft-state` — the two streams are the write half
    * of the ANN index CRUD story (annQueryStream is the read half). */
  def knnGraphDeleteStream(tombstones: DataFrame, idCol: String, vecCol: String,
                           k: Int, planesPerBand: Int, bands: Int, dim: Int,
                           initialCorpus: DataFrame, checkpointDir: String,
                           onUpdate: DataFrame => Unit,
                           trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    maintainedIndexStream(tombstones, idCol, vecCol, k, planesPerBand, bands, dim,
      initialCorpus, checkpointDir, onUpdate, trigger) { (corpus, edges, batch) =>
      val dels = batch.select(col(idCol)).localCheckpoint(false)
      val e = graft.ops.Embeddings.knnGraphDelete(edges, corpus, dels,
        idCol, vecCol, k, planesPerBand, bands, dim)
      val c = corpus.join(dels.select(col(idCol).cast("long").as("__del")),
        corpus(idCol).cast("long") === col("__del"), "left_anti")
      (c, e)
    }

  /** Shared machinery of the maintained-index streams: driver-held
    * (corpus, edges) state folded by `applyBatch` in foreachBatch, with
    * the crash-recovery protocol the checkpointDir contract promises —
    * state persists as parquet under `<checkpointDir>/graft-state/
    * v=<batchId>` with a commit marker written LAST, recovery loads the
    * newest committed state, and a replayed batchId loads instead of
    * re-applying (idempotent apply-or-load, the exactly-once
    * foreachBatch pattern). Storage is bounded to two versions. */
  private def maintainedIndexStream(source: DataFrame, idCol: String, vecCol: String,
                                    k: Int, planesPerBand: Int, bands: Int, dim: Int,
                                    initialCorpus: DataFrame, checkpointDir: String,
                                    onUpdate: DataFrame => Unit, trigger: Trigger)(
      applyBatch: (DataFrame, DataFrame, DataFrame) => (DataFrame, DataFrame)): StreamingQuery = {
    val spark = initialCorpus.sparkSession
    val stateRoot = new org.apache.hadoop.fs.Path(checkpointDir, "graft-state")
    val hfs = stateRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stateDir(v: Long) = new org.apache.hadoop.fs.Path(stateRoot, s"v=$v")
    def marker(v: Long) = new org.apache.hadoop.fs.Path(stateDir(v), "_COMMIT")
    def committed(v: Long): Boolean = hfs.exists(marker(v))
    def loadState(v: Long): (DataFrame, DataFrame) = (
      spark.read.parquet(new org.apache.hadoop.fs.Path(stateDir(v), "corpus").toString),
      spark.read.parquet(new org.apache.hadoop.fs.Path(stateDir(v), "edges").toString))
    def saveState(v: Long, corpus: DataFrame, edges: DataFrame): Unit = {
      corpus.write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(stateDir(v), "corpus").toString)
      edges.write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(stateDir(v), "edges").toString)
      hfs.create(marker(v), true).close() // marker LAST: commit point
      // bound storage: keep only v and v-1 (the replay window)
      if (hfs.exists(stateRoot)) hfs.listStatus(stateRoot).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("v=") && name.drop(2).toLong < v - 1)
          hfs.delete(st.getPath, true)
      }
    }
    // Recover the newest committed state, else build from initialCorpus.
    // The in-memory handles are ALWAYS plain scans of the durable state
    // parquet — never localCheckpoint: a lazily-truncated localCheckpoint
    // whose executor blocks are lost after saveState deletes v-2 would
    // recompute through deleted files and fail the stream. Rooting the
    // lineage in the version the retention window is guaranteed to keep
    // (only < v-1 is ever deleted; handles rebind to v on every commit)
    // makes any recomputation re-read live parquet instead.
    val latest: Option[Long] =
      if (!hfs.exists(stateRoot)) None
      else hfs.listStatus(stateRoot).toSeq
        .map(_.getPath.getName).filter(_.startsWith("v="))
        .map(_.drop(2).toLong).filter(committed).sorted.lastOption
    var (corpus, edges) = latest match {
      case Some(v) => loadState(v)
      case None =>
        // persist the bootstrap state as v=-1 so even a pre-first-batch
        // executor loss recovers from parquet, not from lost blocks
        val c = initialCorpus.select(col(idCol), col(vecCol))
        saveState(-1L, c, graft.ops.Embeddings.knnGraphBanded(c, idCol, vecCol,
          k, planesPerBand, bands, dim))
        loadState(-1L)
    }
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (committed(batchId)) {
          // restart replay of an already-applied batch: load, don't re-apply
          val (c, e) = loadState(batchId)
          corpus = c
          edges = e
          onUpdate(edges)
        } else if (!batch.isEmpty) {
          val (c, e) = applyBatch(corpus, edges, batch)
          saveState(batchId, c, e)
          // rebind to the just-committed durable copy BEFORE any later
          // version deletion can touch what the old handles referenced
          val (c2, e2) = loadState(batchId)
          corpus = c2
          edges = e2
          onUpdate(edges)
        }
      }
      .start()
  }

  /** Streaming ANN serving — the query half of the maintained index
    * (knnGraphMaintainStream is the write half): a stream of query
    * vectors probes a STATIC corpus through the banded-LSH signature
    * join and each query's top-k emits once its watermark window closes.
    * Both probe legs are stream-static (stateless — nothing accumulates
    * with the stream); the only state is the per-query top-k buffer,
    * k-bounded and deduped inside `TopKScoredAggregate(dedup = true)`
    * exactly as in the batch twin, so per-query results are BIT-EQUAL to
    * `Embeddings.annTopKBanded` over the same corpus (StreamingSpec).
    * Emits (query_id, ts, neighbor_id, cos, rnk). */
  def annQueryStream(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, tsCol: String,
                     watermark: String, k: Int,
                     planesPerBand: Int, bands: Int, dim: Int): DataFrame = {
    val signs = graft.ops.Embeddings.planeSigns(planesPerBand * bands, dim)
    def sigCols = (0 until bands).map { b =>
      concat(lit(s"$b:"), graft.ops.Embeddings.lshSignature(col("qe"),
        signs.slice(b * planesPerBand, (b + 1) * planesPerBand)))
    }
    val p = graft.ops.Embeddings.prepared(corpus, idCol, vecCol)
      .withColumn("sig", explode(array(sigCols: _*)))
      .select(col("vec_id").as("neighbor_id"), col("qe").as("nb_qe"),
        col("n2").as("nb_n2"), col("sig"))
    val qs = graft.ops.Embeddings.prepared(
        queries.withWatermark(tsCol, watermark), idCol, vecCol, Seq(tsCol))
      .select(col("vec_id").as("query_id"), col(tsCol).as("__ts"),
        col("qe"), col("n2"), explode(array(sigCols: _*)).as("sig"))
    qs.join(p, Seq("sig")) // stateless stream-static probe
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("__ts"), col("neighbor_id"),
        graft.ops.Embeddings.cosine(
          graft.ops.Embeddings.dotQ(col("qe"), col("nb_qe")),
          col("n2"), col("nb_n2")).as("cos"))
      .groupBy(col("query_id"), window(col("__ts"), "1 second").as("__w"))
      .agg(graft.functions.TopKScoredAggregate
        .top_k_scored(col("neighbor_id"), col("cos"), k, dedup = true).as("top"))
      .select(col("query_id"), col("__w.start").as("ts"),
        posexplode(col("top")).as(Seq("i", "s")))
      .select(col("query_id"), col("ts"), col("s.id").as("neighbor_id"),
        col("s.score").as("cos"), (col("i") + 1).as("rnk"))
  }

  /** File-source stream over a directory of parquet (the smoke path: drop
    * files in, watch aggregates come out). */
  def parquetStream(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Continuous append ingestion into a graft table: every micro-batch
    * commits one manifest version (files + stats), so streaming data is
    * immediately queryable, time-travelable, and ETag-consistent like any
    * batch write. Pair with `GraftTable.compact` on a maintenance cadence
    * — per-trigger commits are how small files accumulate at scale. */
  def appendStream(rows: DataFrame, table: GraftTable,
                   checkpointDir: String,
                   trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) table.append(batch): Unit
      }
      .start()

  /** Continuous CDC ingestion: every micro-batch of role-tagged change
    * rows is merged into the graft table via SyncMerge (insert/update/
    * delete semantics, pruned file rewrite). The streaming analog of the
    * reference's buffered sync writer flush loop (`src/sync/mod.rs:90-109`).
    */
  def cdcUpsertStream(changes: DataFrame, table: GraftTable,
                      pkCols: Seq[String], valueCols: Seq[String],
                      checkpointDir: String,
                      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) SyncMerge.merge(table, batch, pkCols, valueCols): Unit
      }
      .start()

  /** Continuous SCD2 maintenance — a dimension feed streamed into a
    * history-preserving GraftTable: each micro-batch of observations
    * (pkCols..., tsCol, attrCols...) runs `Scd2.applyChanges` against
    * the table's current snapshot and commits ONE atomic new version
    * (`replaceFiles` of the full file set), so readers time-travel over
    * whole dimension states and the CDC/ETag machinery invalidates per
    * batch, never per row. The applyChanges compute touches only the
    * batch's keys (dim-side semi/anti joins + one keyed window over the
    * touched slice); the storage commit rewrites the table — the right
    * trade for dimensions, which are small next to the facts that
    * reference them (a stats-pruned file rewrite is SyncMerge's
    * specialty and composes later if a dimension outgrows it). Single
    * writer per table, the cdcUpsertStream assumption. */
  def scd2Stream(changes: DataFrame, table: GraftTable, pkCols: Seq[String],
                 tsCol: String, attrCols: Seq[String], checkpointDir: String,
                 trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // retryCommit: a concurrent writer (compact/VACUUM on the same
        // table) landing between latestManifest and the commit raises
        // CommitConflict; re-plan the whole batch against the fresh
        // snapshot instead of terminating the streaming query.
        if (!batch.isEmpty) table.retryCommit {
          val m = table.latestManifest
          val next = graft.ops.Scd2.applyChanges(
            table.read(Some(m.version)), batch, pkCols, tsCol, attrCols)
          table.replaceFiles(m, m.files, Seq.empty, next): Unit
        }
      }
      .start()
}

/** transformWithState processor for nearDupDedupStream: each LSH bucket's
  * immutable OWNER is fixed by the first micro-batch that touches the
  * bucket — the batch's earliest (event time, doc id) row, so ownership
  * is deterministic under intra-batch reordering; rows in LATER batches
  * can never reclaim it (append-mode output cannot retract earlier
  * emissions). Every input row is re-emitted tagged with "is my doc the
  * owner". One long of state per live bucket, reclaimed by an
  * event-time timer registered at first touch (TTL configs are
  * processing-time-only and rejected in event-time mode).
  */
/** transformWithState processor for semanticDedupStream: per IVF cell,
  * up to `maxReps` representative (id, quantized vector, |v|²) triples;
  * an arriving vector is a duplicate iff its exact Int64-quantized
  * cosine against any stored representative reaches the threshold.
  * Rows inside a batch process in (event time, vec id) order so results
  * are deterministic under intra-batch reordering. State reclaimed by an
  * event-time timer `stateTtlMs` past the first batch's max event time.
  */
private[streaming] class CellRepsProcessor(threshold: Double, maxReps: Int,
                                           stateTtlMs: Long = 24 * 3600 * 1000L)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, java.sql.Timestamp, Array[Long]), (Long, java.sql.Timestamp, Boolean)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TimeMode, TimerValues, TTLConfig}

  @transient private var reps: ListState[(Long, Array[Long], Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    reps = getHandle.getListState[(Long, Array[Long], Long)]("reps",
      org.apache.spark.sql.Encoders.product[(Long, Array[Long], Long)], TTLConfig.NONE)

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp, Array[Long])],
      timerValues: TimerValues): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
    val sorted = rows.toVector.sortBy(r => (r._3.getTime, r._2))
    if (sorted.isEmpty) return Iterator.empty
    var cur = {
      val b = Vector.newBuilder[(Long, Array[Long], Long)]
      val it = reps.get()
      while (it.hasNext) b += it.next()
      b.result()
    }
    if (cur.isEmpty)
      getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
    var changed = false // only rewrite state if a representative enrolled
    val out = sorted.map { case (_, id, ts, qe) =>
      val n2 = dot(qe, qe)
      val dup = n2 > 0 && cur.exists { case (_, rqe, rn2) =>
        dot(qe, rqe).toDouble / (math.sqrt(n2.toDouble) * math.sqrt(rn2.toDouble)) >= threshold
      }
      if (!dup && cur.size < maxReps) { cur :+= ((id, qe, n2)); changed = true }
      (id, ts, !dup)
    }
    if (changed) reps.put(cur.toArray)
    out.iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
    reps.clear()
    Iterator.empty
  }
}

/** Per-digest first-occurrence ownership for streaming chunk dedup:
  * state is the packed (doc_id << 21 | idx) of the first arrival (same
  * packing and loud bounds as the batch chunkDedup), a row is kept iff
  * it IS that first occurrence. State expires a FIXED interval after
  * the first occurrence (absolute TTL, the same policy as
  * BucketOwnerProcessor — not idle-expiry: continued duplicates do not
  * extend the window, so a span can be re-admitted once its first
  * sighting ages out; the documented bounded-state trade). */
private[streaming] class ChunkOwnerProcessor(stateTtlMs: Long = 24 * 3600 * 1000L)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, java.sql.Timestamp, Int, String),
    (Long, java.sql.Timestamp, Int, String, Boolean)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var owner: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[Long]("owner",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  private def pack(docId: Long, idx: Int): Long = {
    require(idx >= 0 && idx < (1 << 21) && docId >= 0 && docId < (1L << 42),
      s"chunkDedupStream: (doc_id=$docId, idx=$idx) outside the 42+21-bit pack range")
    (docId << 21) | idx
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp, Int, String)],
      timerValues: TimerValues): Iterator[(Long, java.sql.Timestamp, Int, String, Boolean)] = {
    val sorted = rows.toVector.sortBy(r => (r._3.getTime, r._2, r._4))
    val own =
      if (owner.exists()) owner.get()
      else {
        val first = pack(sorted.head._2, sorted.head._4)
        owner.update(first)
        getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
        first
      }
    sorted.iterator.map(r => (r._2, r._3, r._4, r._5, pack(r._2, r._4) == own))
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, java.sql.Timestamp, Int, String, Boolean)] = {
    owner.clear()
    Iterator.empty
  }
}

private[streaming] class BucketOwnerProcessor(stateTtlMs: Long = 24 * 3600 * 1000L)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, java.sql.Timestamp, Long), (Long, java.sql.Timestamp, Boolean)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var owner: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[Long]("owner",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
    val sorted = rows.toVector.sortBy(r => (r._2.getTime, r._1))
    val own =
      if (owner.exists()) owner.get()
      else {
        owner.update(sorted.head._1)
        getHandle.registerTimer(sorted.map(_._2.getTime).max + stateTtlMs)
        sorted.head._1
      }
    sorted.iterator.map(r => (r._1, r._2, r._1 == own))
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
    owner.clear()
    Iterator.empty
  }
}

/** Per-user last-event state for transitionMatrixStream: ValueState =
  * (micros, event_type) of the newest event seen; each arriving row in
  * (event time, event id) order emits one (prev, next, gap_us, ts)
  * transition against the stored last event, then becomes it. Rows
  * older than the stored event (late past the watermark) are dropped —
  * append output cannot retract the transition that already bridged
  * them. Gap arithmetic is exact integer microseconds
  * (epoch-seconds·1e6 + nanos/1e3, the same micros the batch twin's
  * epoch_us computes). State expires stateTtlMs after the user's FIRST
  * event (absolute TTL, the shared bounded-state policy): an idle-or-
  * expired user simply starts a fresh chain. */
private[streaming] class LastEventProcessor(stateTtlMs: Long = 24 * 3600 * 1000L)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, String, java.sql.Timestamp, Long),
    (String, String, Long, java.sql.Timestamp)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var last: ValueState[(Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, String)]("last",
      org.apache.spark.sql.Encoders.product[(Long, String)], TTLConfig.NONE)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(String, String, Long, java.sql.Timestamp)] = {
    val sorted = rows.toVector.sortBy(r => (micros(r._3), r._4))
    if (sorted.isEmpty) return Iterator.empty
    if (!last.exists())
      getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
    var cur = if (last.exists()) Some(last.get()) else None
    val out = Vector.newBuilder[(String, String, Long, java.sql.Timestamp)]
    sorted.foreach { case (_, typ, ts, _) =>
      val tus = micros(ts)
      cur match {
        case Some((ptus, ptyp)) if tus >= ptus =>
          out += ((ptyp, typ, tus - ptus, ts))
          cur = Some((tus, typ))
        case Some(_) => // regression past the watermark: drop, keep state
        case None => cur = Some((tus, typ))
      }
    }
    cur.foreach(last.update)
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, String, Long, java.sql.Timestamp)] = {
    last.clear()
    Iterator.empty
  }
}

/** Per-user funnel-stage state for funnelStream: ValueState =
  * (stage, t1 = first-view micros, tStage = micros of the current
  * stage's entry). Rows process in (event time, id) order; a row
  * advances the pointer iff it is the NEXT stage's event type and
  * strictly later than the current stage entry (ev8's strict-inequality
  * chain). Output rows are (stage entered, conversion gap for stage 3,
  * event ts). State = 3 longs per live user, absolute TTL. */
private[streaming] class FunnelProcessor(stateTtlMs: Long = 24 * 3600 * 1000L)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, String, java.sql.Timestamp, Long),
    (Long, Long, java.sql.Timestamp)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("funnel",
      org.apache.spark.sql.Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, java.sql.Timestamp)] = {
    val sorted = rows.toVector.sortBy(r => (micros(r._3), r._4))
    if (sorted.isEmpty) return Iterator.empty
    if (!st.exists())
      getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
    var cur = if (st.exists()) st.get() else (0L, 0L, 0L)
    val out = Vector.newBuilder[(Long, Long, java.sql.Timestamp)]
    sorted.foreach { case (_, typ, ts, _) =>
      val tus = micros(ts)
      (typ, cur._1) match {
        case ("view", 0L) =>
          cur = (1L, tus, tus); out += ((1L, 0L, ts))
        case ("click", 1L) if tus > cur._3 =>
          cur = (2L, cur._2, tus); out += ((2L, 0L, ts))
        case ("purchase", 2L) if tus > cur._3 =>
          cur = (3L, cur._2, tus); out += ((3L, tus - cur._2, ts))
        case _ => () // not the next stage, or not strictly later: no-op
      }
    }
    st.update(cur)
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, java.sql.Timestamp)] = {
    st.clear()
    Iterator.empty
  }
}

/** Per-user rolling-window state for anomalyStream: ValueState =
  * (last micros, last id, ring of the most recent windowN−1 values in
  * arrival order). Each in-order row closes a windowN-observation
  * trailing window (ring + itself); when the window is FULL the exact
  * integer z² comparison decides the flag — identical arithmetic to the
  * batch ev13 query, so stream and batch agree row-for-row on in-order
  * data. Out-of-order rows (behind the stored last event) are dropped:
  * append output cannot retract the windows that already closed past
  * them. State is ≤ windowN−1 longs + one ordering key per live user,
  * expiring stateTtlMs after the user's first event (absolute TTL, the
  * shared bounded-state policy). */
private[streaming] class RollingZScoreProcessor(windowN: Int, zNum: Long, stateTtlMs: Long)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, java.sql.Timestamp, Long),
    (Long, Long, Long, java.sql.Timestamp)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  require(windowN >= 2 && zNum >= 1, s"need windowN >= 2 and zNum >= 1, got $windowN/$zNum")

  @transient private var ring: ValueState[(Long, Long, Seq[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getValueState[(Long, Long, Seq[Long])]("ring",
      org.apache.spark.sql.Encoders.product[(Long, Long, Seq[Long])], TTLConfig.NONE)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, java.sql.Timestamp)] = {
    val sorted = rows.toVector.sortBy(r => (micros(r._3), r._4))
    if (sorted.isEmpty) return Iterator.empty
    if (!ring.exists())
      getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
    var (ltus, lid, vals) =
      if (ring.exists()) ring.get() else (Long.MinValue, Long.MinValue, Seq.empty[Long])
    val n = windowN.toLong
    val out = Vector.newBuilder[(Long, Long, Long, java.sql.Timestamp)]
    sorted.foreach { case (_, vm, ts, eid) =>
      val tus = micros(ts)
      if (tus > ltus || (tus == ltus && eid > lid)) {
        if (vals.length == windowN - 1) {
          // full trailing window: ring + this row
          val m = vals.sum + vm
          val s2 = vals.map(v => v * v).sum + vm * vm
          val dev = n * vm - m
          if (dev * dev > zNum * zNum * (n * s2 - m * m)) out += ((key, eid, vm, ts))
        }
        vals = (vals :+ vm).takeRight(windowN - 1)
        ltus = tus; lid = eid
      } // else: regression past the intra-batch order — drop, keep state
    }
    ring.update((ltus, lid, vals))
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, java.sql.Timestamp)] = {
    ring.clear()
    Iterator.empty
  }
}

/** CUSUM accumulator (see StreamingOps.cusumStream): state = ONE Long
  * S plus the last-seen (micros, id) ordering key per live user. The
  * clamped recursion S = max(0, S + (x − target)) is exactly the batch
  * closed form P − running-min(P), so stream and batch flag identical
  * rows. */
private[streaming] class CusumProcessor(target: Long, h: Long, stateTtlMs: Long)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, java.sql.Timestamp, Long),
    (Long, Long, Long, java.sql.Timestamp)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  require(h >= 1, s"threshold h must be >= 1, got $h")

  @transient private var acc: ValueState[(Long, Long, Long)] = _ // (ltus, lid, s)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[(Long, Long, Long)]("cusum_acc",
      org.apache.spark.sql.Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, java.sql.Timestamp)] = {
    val sorted = rows.toVector.sortBy(r => (micros(r._3), r._4))
    if (sorted.isEmpty) return Iterator.empty
    if (!acc.exists())
      getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
    var (ltus, lid, s) =
      if (acc.exists()) acc.get() else (Long.MinValue, Long.MinValue, 0L)
    val out = Vector.newBuilder[(Long, Long, Long, java.sql.Timestamp)]
    sorted.foreach { case (_, vm, ts, eid) =>
      val tus = micros(ts)
      if (tus > ltus || (tus == ltus && eid > lid)) {
        s = math.max(0L, s + (vm - target))
        if (s >= h) out += ((key, eid, s, ts))
        ltus = tus; lid = eid
      } // else: regression past the intra-batch order — drop, keep state
    }
    acc.update((ltus, lid, s))
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, java.sql.Timestamp)] = {
    acc.clear()
    Iterator.empty
  }
}

/** EWMA ring (see StreamingOps.ewmaStream): state = the user's last
  * span−1 milli values + the last-seen (micros, id) ordering key. Each
  * surviving row computes ev15's exact formula — weight 2^(span−1−j) for
  * lag j over the present observations, truncated at series start, one
  * integer division — so stream and batch agree bit-for-bit on
  * nonnegative values. */
private[streaming] class EwmaProcessor(span: Int, stateTtlMs: Long)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, java.sql.Timestamp, Long),
    (Long, Long, Long, java.sql.Timestamp)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  require(span >= 1 && span <= 62, s"need 1 <= span <= 62, got $span")

  @transient private var ring: ValueState[(Long, Long, Seq[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getValueState[(Long, Long, Seq[Long])]("ewma_ring",
      org.apache.spark.sql.Encoders.product[(Long, Long, Seq[Long])], TTLConfig.NONE)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, java.sql.Timestamp)] = {
    val sorted = rows.toVector.sortBy(r => (micros(r._3), r._4))
    if (sorted.isEmpty) return Iterator.empty
    if (!ring.exists())
      getHandle.registerTimer(sorted.map(_._3.getTime).max + stateTtlMs)
    var (ltus, lid, vals) =
      if (ring.exists()) ring.get() else (Long.MinValue, Long.MinValue, Seq.empty[Long])
    val out = Vector.newBuilder[(Long, Long, Long, java.sql.Timestamp)]
    sorted.foreach { case (_, vm, ts, eid) =>
      val tus = micros(ts)
      if (tus > ltus || (tus == ltus && eid > lid)) {
        // oldest-first window ending at this row: lag j = L-1-p gets
        // weight 2^(span-1-j) = 2^(span-L+p)
        val window = (vals :+ vm).takeRight(span)
        val len = window.length
        var num = 0L
        var den = 0L
        var p = 0
        while (p < len) {
          val w = 1L << (span - len + p)
          num += window(p) * w
          den += w
          p += 1
        }
        out += ((key, eid, num / den, ts))
        vals = window.takeRight(span - 1)
        ltus = tus; lid = eid
      } // else: regression past the intra-batch order — drop, keep state
    }
    ring.update((ltus, lid, vals))
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, java.sql.Timestamp)] = {
    ring.clear()
    Iterator.empty
  }
}
