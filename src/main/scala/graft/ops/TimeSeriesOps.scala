package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series operators Spark has no single primitive for, composed
  * shuffle-efficiently from built-ins (preference (a) of the custom-op
  * ladder — no custom physical operator needed):
  *
  *  - as-of join: one union + one window pass over a single shuffle on
  *    the key — NOT a range join (which would be O(n*m) per key) and NOT
  *    a per-row subquery; this is the standard distributed formulation
  *    and scales linearly with input size.
  *  - gap-fill/resample: per-key time grid via sequence()+explode, then
  *    forward-fill with last_value(ignoreNulls) over one keyed window.
  */
object TimeSeriesOps {

  /** Zero-padded (epoch-µs, id) ordering key shared by the batch OHLC
    * query (ev7) and the streaming ohlcStream: lexicographic order ==
    * numeric order ONLY for non-negative values ('-' sorts below '0'
    * and flips the order of negatives), so negative inputs raise loudly
    * instead of silently picking a wrong open/close. The id must be
    * integral (≤ 19 digits as a string), so the 20-char pad never
    * truncates — callers route ids through an integral-type check. */
  def ohlcKey(ts: Column, id: Column): Column = {
    val tus = unix_micros(ts)
    concat(
      lpad(when(tus < 0 || id < 0,
        expr("raise_error('ohlc: negative epoch-us or id breaks the padded key order')"))
        .otherwise(tus).cast(StringType), 20, "0"), lit(":"),
      lpad(id.cast(StringType), 20, "0"))
  }

  /** BIGINT ordering key for OHLC groups that are HOUR-ALIGNED (batch
    * ev7): (µs offset within the hour) << 31 | id. Induces the same
    * (ts, id) total order as `ohlcKey` inside any group whose rows share
    * one hour — the hour base is constant there, so ordering by the
    * offset equals ordering by epoch-µs — but the key stays a LONG, and
    * min_by/max_by aggregate in a codegen'd HashAggregate where the
    * string key's var-length buffer forces SortAggregate (a full sort of
    * every event on both sides of the exchange). An hour is 3.6e9 µs
    * (fits 32 bits), so offset<<31 + id stays under 2^63; ids outside
    * [0, 2^31) raise loudly rather than corrupt the order. Streams keep
    * `ohlcKey`: their windows need not align to hours. */
  def ohlcKeyHourPacked(ts: Column, id: Column): Column = {
    val off = unix_micros(ts) - unix_micros(date_trunc("hour", ts))
    when(id < 0 || id >= (1L << 31) || off < 0,
      expr("raise_error('ohlc: id outside [0, 2^31) or pre-epoch ts breaks the packed key order')"))
      .otherwise(off * (1L << 31) + id)
  }

  /** For every left row, attach `valueCol` of the most recent right row
    * with right.ts <= left.ts within the same `keyCol` (classic as-of).
    * `right` must be unique per (key, ts) for deterministic results —
    * pre-aggregate if needed.
    *
    * Implementation: tag and union both sides (right sorts before left on
    * ts ties, making the join inclusive), then last_value(ignoreNulls)
    * over (key ORDER BY ts, side) carries the right value forward onto
    * left rows. One shuffle by key; no join node at all.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String, asOfName: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"), col(valueCol).as("__asof")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.unionByName(r.select(l.columns.map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asOfName, last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__asof")
  }

  /** Resample `valueCol` onto a fixed grid of `stepSeconds` per key:
    * per-key grid from the key's first to last bucket, aggregated actuals
    * joined on, gaps forward-filled from the last present bucket.
    * Output: (key, bucket_start_us, value, filled flag).
    */
  def gapFillResample(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: Column, stepSeconds: Long): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    val bucketed = df
      // integer `div`, not `/`: double division would round near bucket
      // boundaries for large epoch-micro values
      .withColumn("__bucket", expr(s"(unix_micros($tsCol) div ${stepUs}L) * ${stepUs}L"))
      .groupBy(col(keyCol), col("__bucket"))
      .agg(valueCol.as("__v"))
    val grids = bucketed.groupBy(keyCol)
      .agg(min("__bucket").as("__mn"), max("__bucket").as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), lit(stepUs))).as("__bucket"))
    val w = Window.partitionBy(keyCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grids.join(bucketed, Seq(keyCol, "__bucket"), "left")
      .withColumn("value", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("filled", col("__v").isNull)
      .select(col(keyCol), col("__bucket").as("bucket_start_us"), col("value"), col("filled"))
  }

  /** Binned interval join: all (interval, point) pairs with
    * `point.tsCol ∈ [startCol, endCol)` — WITHOUT an equi key. A naive
    * formulation is a broadcast-nested-loop / O(n·m) range join; this is
    * the standard bin-bucketing rewrite (what Databricks' range-join hint
    * does): intervals explode to the `binWidthUs` bins they overlap,
    * points key to the single bin containing them, the join runs as a
    * plain shuffled EQUI-join on the bin id, and the residual predicate
    * re-checks the exact bounds. Each point lies in exactly one bin and
    * an interval covers each of its bins once, so no dedup pass is
    * needed — pair multiplicity is exact.
    *
    * Pick `binWidthUs` ≈ the typical interval length: fan-out per
    * interval is then ~2 bins, and each bin-bucket pairs only co-binned
    * rows — at 100 TB the shuffle carries ~2× the interval rows instead
    * of replicating either side in full. Degenerate/empty intervals
    * (end <= start) produce no pairs.
    *
    * Output: every column of `intervals` plus every column of `points`
    * (caller guarantees disjoint names), one row per matching pair.
    */
  def binnedIntervalJoin(intervals: DataFrame, points: DataFrame,
                         startCol: String, endCol: String, tsCol: String,
                         binWidthUs: Long): DataFrame = {
    require(binWidthUs >= 1, s"binWidthUs must be >= 1, got $binWidthUs")
    require(!intervals.columns.contains("__bin") && !points.columns.contains("__bin"),
      "binnedIntervalJoin reserves the __bin column name; rename it on the input")
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(
          expr(s"$startCol div ${binWidthUs}L"),
          // end is exclusive: a bin is covered iff it starts BEFORE end
          expr(s"($endCol - 1L) div ${binWidthUs}L"))))
    val pt = points.withColumn("__bin", expr(s"$tsCol div ${binWidthUs}L"))
    iv.join(pt, Seq("__bin"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
