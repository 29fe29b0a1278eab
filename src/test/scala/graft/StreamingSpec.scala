package graft

import graft.lake.GraftTable
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming specs: file-source tumbling aggregation into a
  * memory sink, and the continuous CDC-upsert path via foreachBatch. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("tumbling window aggregation over a file stream (memory sink)") {
    val dir = tmpDir("graft-stream-in")
    Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 2.0),
      ("2024-01-01 00:07:00", "view", 5.0))
      .toDF("s", "event_type", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .coalesce(1).write.parquet(dir + "/batch1")
    val stream = StreamingOps.parquetStream(spark, eventSchema, dir + "/batch1")
    val agg = StreamingOps.tumblingAgg(stream, "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winout")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT event_type, n, total_value FROM winout ORDER BY win_start, event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streaming OHLC picks first/last values deterministically per window") {
    val dir = tmpDir("graft-ohlc-in")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_id", LongType),
      StructField("key", StringType), StructField("value", DoubleType)))
    Seq(
      ("2024-01-01 00:01:00", 1L, "a", 5.0),  // open of a's window
      ("2024-01-01 00:01:00", 2L, "a", 9.0),  // ts tie -> id breaks it
      ("2024-01-01 00:04:00", 3L, "a", 2.0),  // close + low
      ("2024-01-01 00:02:00", 4L, "b", 7.0))
      .toDF("s", "event_id", "key", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_id"), col("key"), col("value"))
      .coalesce(1).write.parquet(dir + "/b1")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b1")
    val agg = StreamingOps.ohlcStream(stream, "key", "event_id", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ohlcout").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT key, open, close, low, high, n FROM ohlcout ORDER BY key")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    // a: open = id-1 value (5.0, the lower id on the ts tie), close = 2.0
    assert(rows === Seq(("a", 5.0, 2.0, 2.0, 9.0, 3L), ("b", 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("sliding window aggregation emits overlapping windows") {
    val dir = tmpDir("graft-slide-in")
    Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:06:00", "click", 2.0))
      .toDF("s", "event_type", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .coalesce(1).write.parquet(dir + "/b1")
    val stream = StreamingOps.parquetStream(spark, eventSchema, dir + "/b1")
    val agg = StreamingOps.slidingAgg(stream, "10 minutes", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("slideout").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT date_format(win_start, 'HH:mm') AS s, n, total_value FROM slideout ORDER BY win_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // 00:01 lands in [23:55,00:05) and [00:00,00:10); 00:06 in [00:00,00:10) and [00:05,00:15)
    assert(rows === Seq(("23:55", 1L, 1.0), ("00:00", 2L, 3.0), ("00:05", 1L, 2.0)))
  }

  test("streaming dedup emits one event per key within the watermark") {
    val dir = tmpDir("graft-dedup-in")
    Seq(
      ("2024-01-01 00:01:00", "h1", 1.0),
      ("2024-01-01 00:02:00", "h1", 2.0), // dup of h1
      ("2024-01-01 00:03:00", "h2", 3.0))
      .toDF("s", "event_type", "value") // event_type doubles as the content hash
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .coalesce(1).write.parquet(dir + "/b1")
    val stream = StreamingOps.parquetStream(spark, eventSchema, dir + "/b1")
    val dedup = StreamingOps.dedupStream(stream, Seq("event_type"), "ts", "10 minutes")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedupout").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT event_type, value FROM dedupout ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // exactly one survivor per key; which h1 duplicate survives is
    // batch-order-dependent
    assert(rows.map(_._1) === Seq("h1", "h2"))
    assert(Set(1.0, 2.0).contains(rows.head._2) && rows(1)._2 === 3.0)
  }

  test("streaming near-dup suppression drops band-sharing documents") {
    val dir = tmpDir("graft-neardup")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    Seq(
      (10L, base, "2024-01-01 00:00:00"),
      (11L, base + "tail words changed slightly here", "2024-01-01 00:00:05"), // near-dup of 10
      (12L, "completely different content with many distinct words " +
        "one two three four five six seven eight nine ten", "2024-01-01 00:00:10"))
      .toDF("doc_id", "text", "s")
      .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.nearDupDedupStream(stream, "doc_id", "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardupout").start()
    q.processAllAvailable()
    // append-mode aggregation only emits once the watermark passes a
    // window: a later flush batch advances event time beyond 10 minutes
    Seq((99L, "late flush document advancing the watermark", "2024-01-01 01:00:00"))
      .toDF("doc_id", "text", "s")
      .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b2")
    q.processAllAvailable(); q.stop()
    val survivors = spark.sql("SELECT doc_id FROM neardupout WHERE doc_id < 90 ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    // doc 11 shares LSH bands with doc 10 (identical long prefix); the
    // earlier (ts, id) doc owns the shared buckets, so 11 is suppressed
    // while 10 (owner) and 12 (unique) survive — deterministically
    assert(survivors === Seq(10L, 12L))
  }

  test("streaming incremental dedup verdicts equal the batch twin") {
    val dir = tmpDir("graft-incdedup")
    def words(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val base = words("w", 30)
    val corpus = Seq(
      (100L, base), (101L, base), (102L, words("x", 30)), (103L, "tiny corpus doc"))
      .toDF("doc_id", "text")
    val incRows = Seq(
      (1L, base, "2024-01-01 00:00:00"),              // exact → 100
      (2L, base + " wExtra", "2024-01-01 00:00:02"),  // near → 100
      (3L, words("z", 30), "2024-01-01 00:00:04"),    // new
      (4L, "tiny corpus doc", "2024-01-01 00:00:06"), // short but exact → 103
      (5L, "short novel one", "2024-01-01 00:00:08")) // short, new
    // two micro-batches: stream-static joins are stateless, so batch
    // boundaries must not affect verdicts
    def writeBatch(rows: Seq[(Long, String, String)], p: String): Unit =
      rows.toDF("doc_id", "text", "s")
        .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
        .coalesce(1).write.parquet(dir + p)
    writeBatch(incRows.take(2), "/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.incrementalDedupStream(corpus, stream,
      "doc_id", "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("incdedupout").start()
    q.processAllAvailable()
    writeBatch(incRows.drop(2), "/b2")
    q.processAllAvailable()
    // append-mode aggregation emits once the watermark passes the window
    writeBatch(Seq((99L, "late flush doc", "2024-01-01 01:00:00")), "/b3")
    q.processAllAvailable(); q.stop()
    val got = spark.sql(
      "SELECT doc_id, verdict, COALESCE(match_id, -1) FROM incdedupout " +
      "WHERE doc_id < 90 ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = graft.ops.TextDedup.incrementalDedup(
        corpus, incRows.toDF("doc_id", "text", "s").select(col("doc_id"), col("text")),
        "doc_id", "text", n = 5, k = 16, bands = 8, threshold = 0.8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === want)
    assert(want.map(x => (x._1, x._2)) === Seq(
      (1L, "exact"), (2L, "near"), (3L, "new"), (4L, "exact"), (5L, "new")))
  }

  test("streaming BPE encode equals the batch twin (stateless projection on a stream)") {
    // the encode plan is a pure literal-replace projection (no state, no
    // aggregate), so the SAME Bpe.encodeWith column logic applies to a
    // stream unchanged — batch boundaries cannot affect per-row output
    val dir = tmpDir("graft-bpestream")
    val merges = Seq(("a", "b"), ("ab", "c"))
    def writeBatch(rows: Seq[(Long, String)], p: String): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(dir + p)
    val rows = Seq((1L, "abc ab a"), (2L, "cab abc abc"), (3L, ""))
    writeBatch(rows.take(1), "/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val q = graft.ops.Bpe.encodeWith(stream, "text", "doc_id", merges)
      .writeStream.outputMode("append")
      .format("memory").queryName("bpeencout").start()
    q.processAllAvailable()
    writeBatch(rows.drop(1), "/b2")
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id, tokens, n_tokens FROM bpeencout ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = graft.ops.Bpe.encodeWith(rows.toDF("doc_id", "text"), "text", "doc_id", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(want === Seq((1L, "abc ab a", 3L), (2L, "c ab abc abc", 4L), (3L, "", 0L)))
  }

  test("native session windows merge within the gap and split across it") {
    val dir = tmpDir("graft-sesswin")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),  // within 30m gap: same session
      (1L, "2024-01-01 01:00:00", 4.0),  // 50m silence: NEW session
      (2L, "2024-01-01 00:05:00", 8.0))
      .toDF("user_id", "s", "value")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("value"))
      .coalesce(1).write.parquet(dir + "/b1")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.sessionWindowAgg(stream, "30 minutes", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sesswinout").start()
    q.processAllAvailable()
    // flush: sessions emit when the watermark passes their close
    Seq((9L, "2024-01-01 05:00:00", 0.0)).toDF("user_id", "s", "value")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("value"))
      .coalesce(1).write.parquet(dir + "/b2")
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT user_id, date_format(session_start, 'HH:mm') AS s, n_events, total_value " +
      "FROM sesswinout WHERE user_id < 9 ORDER BY user_id, s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows === Seq(
      (1L, "00:00", 2L, 3.0), // merged pair
      (1L, "01:00", 1L, 4.0), // split by the 50-minute silence
      (2L, "00:05", 1L, 8.0)))
  }

  test("streaming funnel advances stages across micro-batches with strict time order") {
    val dir = tmpDir("graft-funnel")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def write(batch: Seq[(Long, String, String, Long)], name: String): Unit =
      batch.toDF("user_id", "event_type", "s", "event_id")
        .select(col("user_id"), col("event_type"), to_timestamp(col("s")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(dir + "/" + name)
    // batch 1: user 1 views; user 2 clicks FIRST (no view yet → ignored)
    write(Seq(
      (1L, "view", "2024-01-01 00:00:00", 1L),
      (2L, "click", "2024-01-01 00:00:01", 2L),
      (2L, "view", "2024-01-01 00:00:02", 3L)), "b1")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.funnelStream(stream, "user_id", "event_type", "ts", "event_id",
      "10 minutes", windowLen = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnelout").start()
    q.processAllAvailable()
    // batch 2: user 1 clicks then purchases (cross-batch state carry);
    // user 2 clicks at the SAME instant as their view → strict > fails
    write(Seq(
      (1L, "click", "2024-01-01 00:00:05", 4L),
      (1L, "purchase", "2024-01-01 00:00:10", 5L),
      (2L, "click", "2024-01-01 00:00:02", 6L)), "b2")
    q.processAllAvailable()
    write(Seq((9L, "view", "2024-01-01 02:00:00", 9L)), "b3") // watermark flush
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT n_view, n_click, n_purchase, total_convert_us FROM funnelout " +
      "WHERE window_start = TIMESTAMP '2024-01-01 00:00:00'").collect()
    assert(rows.length === 1)
    // views: users 1+2; clicks: user 1 only (2's click not strictly later);
    // purchases: user 1, 10 s after the first view
    assert(rows.head.getLong(0) === 2L)
    assert(rows.head.getLong(1) === 1L)
    assert(rows.head.getLong(2) === 1L)
    assert(rows.head.getLong(3) === 10000000L)
  }

  test("streaming phash dedup suppresses byte-identical payloads across micro-batches") {
    val dir = tmpDir("graft-phashdedup")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def write(batch: Seq[(Long, String, String)], name: String): Unit =
      batch.toDF("doc_id", "text", "s")
        .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
        .coalesce(1).write.parquet(dir + "/" + name)
    // batch 1: doc 10 claims its payload's buckets; doc 12 is unique
    write(Seq(
      (10L, "shared media payload bytes", "2024-01-01 00:00:00"),
      (12L, "a completely different payload", "2024-01-01 00:00:10")), "b1")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("ts"))
    val out = StreamingOps.phashDedupStream(stream, "doc_id", "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("phashout").start()
    q.processAllAvailable()
    // batch 2: doc 11 repeats doc 10's bytes — identical dHash, all 4
    // bands owned by 10 → suppressed CROSS-batch (state survived)
    write(Seq((11L, "shared media payload bytes", "2024-01-01 00:00:05")), "b2")
    q.processAllAvailable()
    // watermark flush so the append-mode window emits
    write(Seq((99L, "late flush payload advancing the watermark", "2024-01-01 01:00:00")), "b3")
    q.processAllAvailable(); q.stop()
    val survivors = spark.sql("SELECT doc_id FROM phashout WHERE doc_id < 90 ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(survivors === Seq(10L, 12L))
  }

  test("streaming chunk dedup drops repeated spans across micro-batches") {
    val dir = tmpDir("graft-chunkdedup")
    def words(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val a = words("a", 10); val b = words("b", 10)
    val c = words("c", 10); val d = words("d", 10)
    // batch 1: doc 1 owns chunks A B; doc 2 repeats B, adds C
    Seq(
      (1L, s"$a $b", "2024-01-01 00:00:00"),
      (2L, s"$b $c", "2024-01-01 00:00:05"))
      .toDF("doc_id", "text", "s")
      .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.chunkDedupStream(stream, "doc_id", "text", "ts",
      "10 minutes", chunkWords = 10)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("chunkdedupout").start()
    q.processAllAvailable()
    // batch 2: doc 3 repeats A from the PREVIOUS batch, adds D; doc 99
    // later advances the watermark so every window flushes
    Seq((3L, s"$a $d", "2024-01-01 00:00:10"))
      .toDF("doc_id", "text", "s")
      .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b2")
    q.processAllAvailable()
    Seq((99L, "late flush document advancing the watermark", "2024-01-01 01:00:00"))
      .toDF("doc_id", "text", "s")
      .select(col("doc_id"), col("text"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b3")
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT doc_id, n_chunks, n_kept, clean_text FROM chunkdedupout WHERE doc_id < 90 ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(x => (x._1, x._2, x._3)).toSeq ===
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 1L)))
    assert(rows(0)._4 === s"$a $b") // first owner keeps everything
    assert(rows(1)._4 === c)        // B suppressed within the batch
    assert(rows(2)._4 === d)        // A suppressed ACROSS batches
  }

  test("streaming heavy hitters merge counters across micro-batches") {
    val dir = tmpDir("graft-hh")
    val schema = StructType(Seq(
      StructField("text", StringType), StructField("ts", TimestampType)))
    def write(sub: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("text", "s")
        .select(col("text"), to_timestamp(col("s")).as("ts"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    write("b1", Seq(("a a a b", "2024-01-01 00:00:00"), ("b c", "2024-01-01 00:10:00")))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.heavyHittersStream(stream, "text", "ts",
      "10 minutes", "1 hour", capacity = 8)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hhout").start()
    q.processAllAvailable()
    // same window, later batch: counters must MERGE (a: 3+2, b: 2+1)
    write("b2", Seq(("a a b", "2024-01-01 00:20:00")))
    q.processAllAvailable()
    write("b3", Seq(("flush", "2024-01-01 03:00:00"))) // watermark flush
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT win_start, top FROM hhout ORDER BY win_start LIMIT 1")
      .collect().map(r => r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getString(0), e.getLong(1))))
    // capacity > vocab => MG counters are exact: a=5, b=3, c=1
    assert(rows.head === Seq(("a", 5L), ("b", 3L), ("c", 1L)))
  }

  test("streaming KMV approx-distinct merges sketches across micro-batches") {
    val dir = tmpDir("graft-kmv")
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("ts", TimestampType)))
    def write(sub: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("k", "s")
        .select(col("k"), to_timestamp(col("s")).as("ts"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    // 40 distinct keys split across two micro-batches of the same window
    // (with overlap, so the merge must also dedup)
    val keys = (0 until 40).map(i => s"u$i")
    write("b1", keys.take(25).map(k => (k, "2024-01-01 00:05:00")))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.approxDistinctStream(stream, "k", "ts",
      "10 minutes", "1 hour", k = 16)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("kmvout").start()
    q.processAllAvailable()
    write("b2", keys.drop(20).map(k => (k, "2024-01-01 00:40:00"))) // same window
    q.processAllAvailable()
    write("b3", Seq(("flush", "2024-01-01 03:00:00"))) // watermark flush
    q.processAllAvailable(); q.stop()
    val est = spark.sql(
      "SELECT n_distinct_est FROM kmvout ORDER BY win_start LIMIT 1")
      .collect().map(_.getLong(0))
    // closed-window estimate is bit-identical to the batch formula over
    // the same 40 distinct keys
    import graft.functions.MinKMd5Aggregate.min_k_md5
    val batch = keys.toDF("k")
      .agg(min_k_md5(col("k"), 16).as("sk"))
      .select(expr("CASE WHEN size(sk) < 16 THEN CAST(size(sk) AS BIGINT) " +
        "ELSE 15L * 4503599627370496L div CAST(conv(substring(element_at(sk, 16), 1, 13), 16, 10) AS BIGINT) END"))
      .collect().head.getLong(0)
    assert(est.head === batch)
    // sketch-path sanity: 40 > k so this IS an estimate, within 60% of truth
    assert(est.head > 16L && math.abs(est.head - 40L) <= 24L)
  }

  test("streaming transition matrix chains events across micro-batches") {
    val dir = tmpDir("graft-transitions")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def write(sub: String, rows: Seq[(Long, String, String, Long)]): Unit =
      rows.toDF("user_id", "event_type", "s", "event_id")
        .select(col("user_id"), col("event_type"),
          to_timestamp(col("s")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    write("b1", Seq(
      (1L, "view", "2024-01-01 00:00:00", 1L),
      (1L, "click", "2024-01-01 00:00:10", 2L),
      (2L, "view", "2024-01-01 00:05:00", 3L)))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.transitionMatrixStream(stream, "user_id",
      "event_type", "ts", "event_id", "10 minutes", "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("transout").start()
    q.processAllAvailable()
    // batch 2: u1 purchase chains ACROSS batches (click@10s -> 30s);
    // u1's 00:00:05 event regressed behind the stored click -> dropped;
    // u2's click lands in the next hour window
    write("b2", Seq(
      (1L, "purchase", "2024-01-01 00:00:30", 4L),
      (1L, "view", "2024-01-01 00:00:05", 5L),
      (2L, "click", "2024-01-01 01:00:00", 6L)))
    q.processAllAvailable()
    // watermark flush
    write("b3", Seq((99L, "view", "2024-01-01 03:00:00", 7L)))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT date_format(window_start, 'HH:mm') AS w, prev_type, next_type, n, total_gap_us " +
        "FROM transout ORDER BY w, prev_type, next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("00:00", "click", "purchase", 1L, 20000000L),
      ("00:00", "view", "click", 1L, 10000000L),
      ("01:00", "view", "click", 1L, 3300000000L)))
  }

  test("streaming semantic dedup suppresses near-identical vectors per trained cell") {
    val dir = tmpDir("graft-semdedup")
    val rnd = new scala.util.Random(5)
    // train a 2-cell index on two well-separated batch clusters
    val axisA = Array.fill(16)(rnd.nextGaussian())
    val axisB = Array.fill(16)(rnd.nextGaussian())
    val trainVecs = (0 until 20).map { i =>
      val b = if (i % 2 == 0) axisA else axisB
      (i.toLong, b.map(x => (x + 0.1 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = ops.Embeddings.trainIndex(trainVecs, "vec_id", "embedding", numCells = 2)
    // stream: 100 enrolls in cluster A; 101 is a near-copy of 100
    // (duplicate); 102 is cluster B (unique, different cell)
    val v100 = axisA.map(x => (x + 0.01).toFloat)
    Seq(
      (100L, v100, "2024-01-01 00:00:00"),
      (101L, v100.map(x => x + 1e-4f), "2024-01-01 00:00:05"),
      (102L, axisB.map(_.toFloat), "2024-01-01 00:00:10"))
      .toDF("vec_id", "embedding", "s")
      .select(col("vec_id"), col("embedding"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b1")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("ts", TimestampType)))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.semanticDedupStream(stream, "vec_id", "embedding",
      "ts", "10 minutes", cents, threshold = 0.95)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("semdedupout").start()
    q.processAllAvailable()
    // a second batch: 103 duplicates 102 ACROSS micro-batches (state
    // must remember 102's enrollment), 104 is novel in cluster A but
    // far from 100
    Seq(
      (103L, axisB.map(x => (x + 1e-4).toFloat), "2024-01-01 00:01:00"),
      (104L, axisA.map(x => (-x).toFloat), "2024-01-01 00:01:05"))
      .toDF("vec_id", "embedding", "s")
      .select(col("vec_id"), col("embedding"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(dir + "/b2")
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT vec_id, kept FROM semdedupout ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got === Seq((100L, true), (101L, false), (102L, true),
      (103L, false), (104L, true)), got.toString)
  }

  test("watermarked stream-stream interval join is state-bounded") {
    val ldir = tmpDir("graft-ssj-l"); val rdir = tmpDir("graft-ssj-r")
    Seq(("2024-01-01 00:10:00", "u1", 1.0))
      .toDF("s", "event_type", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .coalesce(1).write.parquet(ldir + "/b1")
    Seq(("2024-01-01 00:06:00", "u1", 100.0), // within 5-min lookback
        ("2024-01-01 00:01:00", "u1", 200.0)) // too old
      .toDF("s", "event_type", "rvalue")
      .select(to_timestamp(col("s")).as("rts"), col("event_type"), col("rvalue"))
      .coalesce(1).write.parquet(rdir + "/b1")
    val rSchema = StructType(Seq(
      StructField("rts", TimestampType), StructField("event_type", StringType),
      StructField("rvalue", DoubleType)))
    val l = StreamingOps.parquetStream(spark, eventSchema, ldir + "/b1")
    val r = StreamingOps.parquetStream(spark, rSchema, rdir + "/b1")
    val joined = StreamingOps.intervalJoinStream(l, r, "event_type", "5 MINUTES", "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjout").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT event_type, rvalue FROM ssjout")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows === Seq(("u1", 100.0)))
  }

  test("streaming append commits queryable manifest versions") {
    val inDir = tmpDir("graft-sappend-in"); val ckDir = tmpDir("graft-sappend-ck")
    val t = GraftTable.create(spark, tmpDir("graft-sappend-table"),
      StructType(Seq(StructField("ts", TimestampType),
        StructField("event_type", StringType), StructField("value", DoubleType))))
    Seq(("2024-01-01 00:01:00", "click", 1.0), ("2024-01-01 00:02:00", "view", 2.0))
      .toDF("s", "event_type", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .coalesce(1).write.parquet(inDir + "/b1")
    val q = StreamingOps.appendStream(
      StreamingOps.parquetStream(spark, eventSchema, inDir + "/b1"), t, ckDir,
      Trigger.ProcessingTime("1 second"))
    q.processAllAvailable(); q.stop()
    assert(t.read().count() === 2)
    assert(t.latestManifest.version >= 1) // create=v0, stream batch commits follow
    assert(t.latestManifest.files.forall(_.stats.contains("value")))
  }

  test("streaming anomaly flags close trailing windows across micro-batches") {
    val dir = tmpDir("graft-anom")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def write(sub: String, rows: Seq[(Long, Double, String, Long)]): Unit =
      rows.toDF("user_id", "value", "s", "event_id")
        .select(col("user_id"), col("value"), to_timestamp(col("s")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // batch 1: seven calm observations (windowN=8 ring fills to 7)
    write("b1", (1 to 7).map(i => (1L, 10.0, f"2024-01-01 00:00:0${i - 1}", i.toLong)))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.anomalyStream(stream, "user_id", "value", "ts", "event_id",
      watermark = "10 minutes", windowN = 8, zNum = 2L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anomout").start()
    q.processAllAvailable()
    // batch 2: the spike closes a window SPANNING batches (state carry);
    // the calm row after it sees the spike inside its window (inflated
    // variance -> no flag); the late row regressing behind the last
    // event is dropped even though its value would otherwise flag
    write("b2", Seq(
      (1L, 94.0, "2024-01-01 00:00:10", 8L),
      (1L, 10.0, "2024-01-01 00:00:11", 9L),
      (1L, 500.0, "2024-01-01 00:00:02", 10L)))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT user_id, event_id, vm FROM anomout ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 8L, 94000L)))
  }

  test("streaming EWMA matches the batch formula across micro-batches") {
    val dir = tmpDir("graft-ewma")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def write(sub: String, rows: Seq[(Long, Double, String, Long)]): Unit =
      rows.toDF("user_id", "value", "s", "event_id")
        .select(col("user_id"), col("value"), to_timestamp(col("s")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val vals = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 3.0)
    write("b1", vals.take(6).zipWithIndex.map { case (v, i) =>
      (1L, v, f"2024-01-01 00:00:0$i", (i + 1).toLong) })
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.ewmaStream(stream, "user_id", "value", "ts", "event_id",
      watermark = "10 minutes", span = 4)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ewmaout").start()
    q.processAllAvailable()
    // batch 2 continues the series (ring carries values 4..6 across the
    // batch boundary) + a regressing late row that must be dropped
    write("b2", (vals.drop(6).zipWithIndex.map { case (v, i) =>
      (1L, v, f"2024-01-01 00:00:0${6 + i}", (7 + i).toLong) }) :+
      (1L, 999.0, "2024-01-01 00:00:01", 99L))
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT event_id, ewma_milli FROM ewmaout ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // reference: ev15's formula on the same series, span 4
    val expect = vals.indices.map { i =>
      val window = vals.slice(math.max(0, i - 3), i + 1).map(v => math.round(v * 1000))
      val len = window.length
      val terms = window.zipWithIndex.map { case (v, p) => (v, 1L << (4 - len + p)) }
      ((i + 1).toLong, terms.map(t => t._1 * t._2).sum / terms.map(_._2).sum)
    }
    assert(got.toSeq === expect)
  }

  test("streaming KLL quantiles merge sketches across micro-batches") {
    val dir = tmpDir("graft-kllq")
    val schema = StructType(Seq(
      StructField("v", LongType), StructField("ts", TimestampType)))
    def write(sub: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("v", "s")
        .select(col("v"), to_timestamp(col("s")).as("ts"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    // values 1..60 split across two batches of one window; with n=60 <<
    // k=200 the sketch retains everything -> estimates are EXACT order
    // statistics, so the cross-batch merge is deterministic here
    write("b1", (1L to 30L).map(v => (v, "2024-01-01 00:05:00")))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.quantileStream(stream, "v", "ts",
      "10 minutes", "1 hour", ranks = Seq(0.5, 0.9))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("kllqout").start()
    q.processAllAvailable()
    write("b2", (31L to 60L).map(v => (v, "2024-01-01 00:40:00")))
    q.processAllAvailable()
    write("b3", Seq((0L, "2024-01-01 03:00:00"))) // watermark flush
    q.processAllAvailable(); q.stop()
    val est = spark.sql(
      "SELECT q_est FROM kllqout ORDER BY win_start LIMIT 1")
      .collect().head.getSeq[Long](0)
    assert(est === Seq(30L, 54L)) // inclusive rank: ceil(0.5*60), ceil(0.9*60)
  }

  test("streaming CUSUM carries the accumulator across micro-batches") {
    val dir = tmpDir("graft-cusum")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType),
      StructField("ts", TimestampType), StructField("event_id", LongType)))
    def write(sub: String, rows: Seq[(Long, Double, String, Long)]): Unit =
      rows.toDF("user_id", "value", "s", "event_id")
        .select(col("user_id"), col("value"), to_timestamp(col("s")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(dir + "/" + sub)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // target 10_000 milli-units, h = 5_000: values 12.0 drift +2000/step
    write("b1", (0 to 2).map(i => (1L, 12.0, f"2024-01-01 00:00:0$i", (i + 1).toLong)))
    val stream = StreamingOps.parquetStream(spark, schema, dir + "/b*")
    val out = StreamingOps.cusumStream(stream, "user_id", "value", "ts", "event_id",
      watermark = "10 minutes", target = 10000L, h = 5000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cusumout").start()
    q.processAllAvailable()
    // batch 2: event 4 reaches 9000 only because S=6000 carried across
    // the batch boundary; the dip to 1.0 then clamps S back to zero
    write("b2", Seq(
      (1L, 13.0, "2024-01-01 00:00:03", 4L),
      (1L, 1.0, "2024-01-01 00:00:04", 5L),
      (1L, 12.0, "2024-01-01 00:00:05", 6L)))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT event_id, cusum FROM cusumout ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // S path: 2000, 4000, 6000(flag), 9000(flag), 0, 2000
    assert(rows.toSeq === Seq((3L, 6000L), (4L, 9000L)))
  }

  test("streaming SCD2 keeps a graft table equal to a from-scratch rebuild") {
    val inDir = tmpDir("graft-scd2-in")
    val ckDir = tmpDir("graft-scd2-ck")
    val t = GraftTable.create(spark, tmpDir("graft-scd2-table"),
      StructType(Seq(StructField("id", LongType), StructField("tier", StringType),
        StructField("valid_from", LongType), StructField("valid_to", LongType),
        StructField("is_current", BooleanType))))
    val obsSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", LongType),
      StructField("tier", StringType)))
    val b1 = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "x"))
    val b2 = Seq((1L, 30L, "b"), (1L, 15L, "c"), (2L, 40L, "y")) // no-op + backfill + change
    b1.toDF("id", "ts", "tier").coalesce(1).write.parquet(inDir + "/b1")
    val stream = spark.readStream.schema(obsSchema).parquet(inDir + "/b*")
    val q = StreamingOps.scd2Stream(stream, t, Seq("id"), "ts", Seq("tier"), ckDir,
      Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    b2.toDF("id", "ts", "tier").coalesce(1).write.parquet(inDir + "/b2")
    q.processAllAvailable(); q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id", "valid_from").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    val full = graft.ops.Scd2.fromHistory(
      (b1 ++ b2).toDF("id", "ts", "tier"), Seq("id"), "ts", Seq("tier"))
      .select("id", "tier", "valid_from", "valid_to", "is_current")
    assert(canon(t.read()) === canon(full))
    // the backfilled 15->'c' spliced: key 1 history is a@10, c@15, b@20
    assert(canon(t.read()).filter(_._1 == 1L).map(_._2) === Seq("a", "c", "b"))
  }

  test("continuous CDC upsert stream merges micro-batches into a graft table") {
    val inDir = tmpDir("graft-cdc-in")
    val ckDir = tmpDir("graft-cdc-ck")
    val t = GraftTable.create(spark, tmpDir("graft-cdc-table"),
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    val changeSchema = StructType(Seq(
      StructField("old_id", LongType), StructField("new_id", LongType),
      StructField("v", DoubleType), StructField("_seq", LongType)))
    Seq((Option.empty[Long], Some(1L), 10.0, 1L), (Option.empty[Long], Some(2L), 20.0, 2L))
      .toDF("old_id", "new_id", "v", "_seq").coalesce(1).write.parquet(inDir + "/b1")
    val stream = spark.readStream.schema(changeSchema).parquet(inDir + "/b1")
    val q = StreamingOps.cdcUpsertStream(stream, t, Seq("id"), Seq("v"), ckDir,
      Trigger.ProcessingTime("1 second"))
    q.processAllAvailable(); q.stop()
    val rows = t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((1L, 10.0), (2L, 20.0)))
  }

  test("streaming ANN serving equals the batch banded top-k per query") {
    val inDir = tmpDir("graft-annq-in")
    def vec(seed: Long): Array[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(32) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt % 1000) / 1000.0f
      }
    }
    val corpus = (0L until 50L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // query stream = corpus members 0..9 so annTopKBanded is the exact twin
    def writeBatch(ids: Seq[Long], p: String): Unit =
      ids.map(i => (i, vec(i), new java.sql.Timestamp(1700000000000L + i * 1000)))
        .toDF("vec_id", "embedding", "ts").coalesce(1).write.parquet(inDir + p)
    writeBatch(0L until 5L, "/b1")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema).parquet(inDir + "/b*")
    val out = StreamingOps.annQueryStream(stream, corpus,
      "vec_id", "embedding", "ts", "1 second", k = 3,
      planesPerBand = 3, bands = 2, dim = 32)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("annqout").start()
    q.processAllAvailable()
    writeBatch(5L until 10L, "/b2")
    q.processAllAvailable()
    // a late flush row pushes the watermark past the last real window
    writeBatch(Seq(999L), "/b3")
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT query_id, neighbor_id, cos, rnk FROM annqout WHERE query_id < 10")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = ops.Embeddings.annTopKBanded(corpus, "vec_id", "embedding",
        col("vec_id") < 10, k = 3, planesPerBand = 3, bands = 2, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streamed kNN maintenance equals the full rebuild after every micro-batch") {
    val inDir = tmpDir("graft-knn-in")
    val ckDir = tmpDir("graft-knn-ck")
    def vec(seed: Long): Array[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(32) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt % 1000) / 1000.0f
      }
    }
    val corpus = (0L until 30L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val b1 = (30L until 40L).map(i => (i, vec(i)))
    val b2 = (40L until 50L).map(i => (i, vec(i)))
    b1.toDF("vec_id", "embedding").coalesce(1).write.parquet(inDir + "/b1")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(inDir + "/b*")
    val published = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Double)]]
    val q = StreamingOps.knnGraphMaintainStream(stream, "vec_id", "embedding",
      k = 3, planesPerBand = 3, bands = 2, dim = 32, corpus, ckDir,
      edges => published += edges.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
      Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    b2.toDF("vec_id", "embedding").coalesce(1).write.parquet(inDir + "/b2")
    q.processAllAvailable(); q.stop()
    def rebuild(upTo: Long) = graft.ops.Embeddings.knnGraphBanded(
        (0L until upTo).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, planesPerBand = 3, bands = 2, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(published.size === 2)
    assert(published(0) === rebuild(40L), "after batch 1")
    assert(published(1) === rebuild(50L), "after batch 2 (increments compose)")
  }

  test("streamed kNN tombstones equal the full surviving-corpus rebuild after every micro-batch") {
    val inDir = tmpDir("graft-knndel-in")
    val ckDir = tmpDir("graft-knndel-ck")
    def vec(seed: Long): Array[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(32) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt % 1000) / 1000.0f
      }
    }
    val all = (0L until 40L).map(i => (i, vec(i)))
    val corpus = all.toDF("vec_id", "embedding")
    val del1 = Seq(5L, 12L, 18L)
    val del2 = Seq(25L, 3L)
    del1.map(i => (i, vec(i))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(inDir + "/b1")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(inDir + "/b*")
    val published = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Double)]]
    val q = StreamingOps.knnGraphDeleteStream(stream, "vec_id", "embedding",
      k = 3, planesPerBand = 3, bands = 2, dim = 32, corpus, ckDir,
      edges => published += edges.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
      Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    del2.map(i => (i, vec(i))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(inDir + "/b2")
    q.processAllAvailable(); q.stop()
    def rebuild(dead: Set[Long]) = graft.ops.Embeddings.knnGraphBanded(
        all.filterNot(p => dead(p._1)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, planesPerBand = 3, bands = 2, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(published.size === 2)
    assert(published(0) === rebuild(del1.toSet), "after tombstone batch 1")
    assert(published(1) === rebuild((del1 ++ del2).toSet),
      "after tombstone batch 2 (delete-repairs compose)")
    // no tombstoned node survives on either side of any edge
    val dead = (del1 ++ del2).toSet
    assert(published(1).forall { case (n, nb, _) => !dead(n) && !dead(nb) })
  }

  test("kNN maintain stream recovers corpus+edges from checkpointDir after a restart") {
    val inDir = tmpDir("graft-knnrec-in")
    val ckDir = tmpDir("graft-knnrec-ck")
    def vec(seed: Long): Array[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(32) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt % 1000) / 1000.0f
      }
    }
    val corpus = (0L until 30L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    (30L until 40L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(inDir + "/b1")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val published = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Double)]]
    def publish(edges: org.apache.spark.sql.DataFrame): Unit =
      published += edges.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val q1 = StreamingOps.knnGraphMaintainStream(
      spark.readStream.schema(schema).parquet(inDir + "/b*"),
      "vec_id", "embedding", k = 3, planesPerBand = 3, bands = 2, dim = 32,
      corpus, ckDir, publish, Trigger.ProcessingTime("1 second"))
    q1.processAllAvailable(); q1.stop()
    // restart against the same checkpoint with an EMPTY initial corpus:
    // state must come from the persisted graft-state, not the argument —
    // previously ingested batches would otherwise be silently lost
    (40L until 50L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(inDir + "/b2")
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q2 = StreamingOps.knnGraphMaintainStream(
      spark.readStream.schema(schema).parquet(inDir + "/b*"),
      "vec_id", "embedding", k = 3, planesPerBand = 3, bands = 2, dim = 32,
      empty, ckDir, publish, Trigger.ProcessingTime("1 second"))
    q2.processAllAvailable(); q2.stop()
    def rebuild(upTo: Long) = graft.ops.Embeddings.knnGraphBanded(
        (0L until upTo).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, planesPerBand = 3, bands = 2, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(published.head === rebuild(40L), "before restart")
    assert(published.last === rebuild(50L), "after restart: corpus 0..30 + b1 survived")
    // the persisted state layout: newest version carries a commit marker
    val stateRoot = new java.io.File(ckDir, "graft-state")
    val versions = Option(stateRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("v=")).map(_.getName.drop(2).toLong).sorted
    assert(versions.nonEmpty)
    assert(new java.io.File(stateRoot, s"v=${versions.last}/_COMMIT").exists())
  }
}
