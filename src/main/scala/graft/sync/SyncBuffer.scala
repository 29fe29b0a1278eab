package graft.sync

import scala.collection.mutable

import graft.sql.GraftContext
import org.apache.spark.sql.functions.lit

/** Buffering CDC writer: the in-memory stage between the sync endpoint and
  * the lake (reference `src/sync/writer.rs:27-129,336-387` + flush task
  * `src/sync/mod.rs:90-109`). POSTed change batches are acknowledged into a
  * per-table queue (memory watermark) and merged into the table — ONE
  * version for the whole queue — only when a flush triggers:
  *
  *   - the queue holds `maxBatches` batches, or
  *   - it holds `maxRows` buffered change rows, or
  *   - its oldest batch is older than `maxAgeMs` (the frontend's flush
  *     task sweeps ages), or
  *   - shutdown (`flushAll`).
  *
  * Cross-batch squash happens inside the single merge: batches are
  * unioned with a `__batch` ordinal, and SyncMerge's last-write-per-PK
  * squash orders by (batch, _seq) — so 50 small POSTs touching the same
  * keys produce one rewritten file set, not 50 versions of manifest churn
  * and small files.
  *
  * Watermarks: an origin's MEMORY sequence advances on enqueue (the batch
  * is acknowledged and will not be re-applied on redelivery); its DURABLE
  * sequence advances only after the flush commits. `/sync/progress`
  * reports both, mirroring the reference's volatile-vs-durable sequence
  * distinction (`src/frontend/flight/handler.rs:90-121`).
  */
class SyncBuffer(ctx: GraftContext,
                 maxRows: Long = 65536,
                 maxBatches: Int = 64,
                 maxAgeMs: Long = 1000) {

  sealed trait SyncResult
  /** Batch at or below a watermark: acknowledged, not applied. */
  case class Skipped(origin: String, seq: Long) extends SyncResult
  /** Enqueued; durable after a later flush. */
  case class Buffered(origin: Option[String], seq: Option[Long]) extends SyncResult
  /** This add tripped a threshold and the whole queue committed. */
  case class Flushed(version: Long, origin: Option[String], seq: Option[Long]) extends SyncResult

  private case class Key(db: String, schema: String, table: String)
  private case class Batch(lines: Array[String], pkCols: Seq[String], valueCols: Seq[String],
                           origin: Option[String], seq: Option[Long], atMs: Long)

  private val queues = mutable.LinkedHashMap.empty[Key, mutable.ArrayBuffer[Batch]]
  // origin -> highest acknowledged (possibly unflushed) sequence
  private val memSeq = mutable.Map.empty[String, Long]

  /** Memory watermarks (>= durable for every origin with buffered data). */
  def memoryProgress: Map[String, Long] = synchronized(memSeq.toMap)

  /** Acknowledge one POSTed batch. The watermark check, enqueue, and any
    * triggered flush are atomic on the buffer, so a redelivered stale
    * batch racing a newer one can't slip past the pre-check. */
  def add(db: String, schema: String, table: String, lines: Array[String],
          pkCols: Seq[String], valueCols: Seq[String],
          origin: Option[String], seq: Option[Long]): SyncResult = synchronized {
    (origin, seq) match {
      case (Some(o), Some(n)) =>
        val durable = ctx.catalog.syncProgress.get(o).getOrElse(Long.MinValue)
        val acknowledged = math.max(durable, memSeq.getOrElse(o, Long.MinValue))
        if (acknowledged >= n) return Skipped(o, acknowledged)
      case _ =>
    }
    val key = Key(db, schema, table)
    val q = queues.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
    // a batch with a different key/value column spec can't share a merge —
    // commit what's queued first, then start a fresh queue for the new spec
    if (q.nonEmpty && (q.head.pkCols != pkCols || q.head.valueCols != valueCols))
      flushKey(key)
    queues.getOrElseUpdate(key, mutable.ArrayBuffer.empty) +=
      Batch(lines, pkCols, valueCols, origin, seq, System.currentTimeMillis)
    for (o <- origin; n <- seq) memSeq(o) = math.max(memSeq.getOrElse(o, Long.MinValue), n)
    val queued = queues(key)
    if (queued.length >= maxBatches || queued.iterator.map(_.lines.length.toLong).sum >= maxRows)
      Flushed(flushKey(key), origin, seq)
    else Buffered(origin, seq)
  }

  /** Flush queues whose oldest batch exceeds the lag bound (called by the
    * frontend's periodic flush task, ref `src/sync/mod.rs:90-109`). */
  def flushAged(): Unit = synchronized {
    val now = System.currentTimeMillis
    queues.filter { case (_, q) => q.headOption.exists(now - _.atMs >= maxAgeMs) }
      .keys.toSeq.foreach(flushKey)
  }

  /** Commit every queue (shutdown path). */
  def flushAll(): Unit = synchronized {
    queues.keys.toSeq.foreach(flushKey)
  }

  // caller holds the buffer lock
  private def flushKey(key: Key): Long = {
    val batches = queues.remove(key).getOrElse(return -1L)
    try {
      val spark = ctx.spark
      import org.apache.spark.sql.Encoders
      // one DataFrame over every queued batch; the batch ordinal breaks
      // _seq ties across batches so the merge's squash keeps the LAST
      // write per PK in arrival order (cross-batch squash)
      val all = batches.zipWithIndex.map { case (b, i) =>
        spark.read.json(spark.createDataset(b.lines.toIndexedSeq)(Encoders.STRING))
          .withColumn("__batch", lit(i))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      ctx.locked {
        val uuid = ctx.catalog.getTable(key.db, key.schema, key.table).getOrElse(
          throw new IllegalArgumentException(s"unknown table ${key.schema}.${key.table}"))
        val table = new graft.lake.GraftTable(spark, ctx.catalog.tableRoot(uuid))
        val version = SyncMerge.merge(table, all, batches.head.pkCols, batches.head.valueCols)
        ctx.markDirty()
        // durable watermarks advance only AFTER the merge committed
        batches.flatMap(b => b.origin.zip(b.seq))
          .groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).max }
          .foreach { case (o, n) => ctx.catalog.advanceSyncSeq(o, n) }
        version
      }
    } catch {
      case e: Throwable =>
        // a failed flush re-queues its batches (front, original order) so
        // the data survives for the next trigger instead of vanishing
        // behind an already-advanced memory watermark
        val q = queues.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
        q.prependAll(batches)
        throw e
    }
  }
}
