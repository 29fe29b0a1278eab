package graft.streaming

import graft.lake.GraftTable
import graft.sync.SyncMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

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
}
