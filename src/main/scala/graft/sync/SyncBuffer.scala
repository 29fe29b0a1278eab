package graft.sync

import scala.collection.mutable

import graft.sql.GraftContext

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
  * Cross-batch squash happens driver-side before the single merge, by
  * FOLDING the buffered changes in arrival order into PK chains (the
  * reference's physical squash, `src/sync/utils.rs` squash_batches):
  * insert→update collapses to one insert carrying the resolved values
  * (Changed=false keeps the earlier write, not a placeholder), A→B→C PK
  * moves collapse to A→C (no stale intermediate row), insert→delete
  * vanishes. SyncMerge's own last-write-per-PK squash would corrupt
  * exactly these chains — its contract is one hop per batch — so the
  * buffer must hand it chain-free rows. 50 small POSTs still produce one
  * rewritten file set, not 50 versions of manifest churn.
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
  // (table, origin) -> highest manifest watermark this process has
  // observed (monotone, so a cached value deciding a skip is always
  // safe); advanced by our own flushes, refreshed from the manifest only
  // when neither memSeq nor the catalog already decides — keeps the
  // per-POST hot path free of manifest I/O under the buffer lock
  private val manifestSeqCache = mutable.Map.empty[(Key, String), Long]

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
        // three watermark sources, highest wins: the in-memory
        // acked-but-unflushed sequence (free), the catalog (global,
        // advanced AFTER the flush — may LAG a crash), and the TABLE
        // MANIFEST (written atomically WITH the applying commit — the
        // authoritative crash-safe mark; a redelivery after a death
        // between the data commit and the catalog advance is caught
        // exactly here). Checked cheapest-first and short-circuiting:
        // the manifest read (hint file + manifest I/O under the buffer
        // lock) only happens when neither the memory mark nor the
        // catalog already decides the skip — in steady state memSeq
        // answers every redelivery with zero I/O. Watermarks are
        // monotone, so a cached manifest mark that decides a skip is
        // always safe; when the cache can't decide, one fresh read
        // refreshes it (and our own flushes advance it directly).
        val mem = memSeq.getOrElse(o, Long.MinValue)
        if (mem >= n) return Skipped(o, mem)
        val durable = ctx.catalog.syncProgress.get(o).getOrElse(Long.MinValue)
        if (durable >= n) return Skipped(o, durable)
        val cacheKey = (Key(db, schema, table), o)
        val cached = manifestSeqCache.getOrElse(cacheKey, Long.MinValue)
        if (cached >= n) return Skipped(o, cached)
        val applied = manifestSeq(db, schema, table, o)
        manifestSeqCache(cacheKey) = math.max(cached, applied)
        if (applied >= n) return Skipped(o, applied)
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

  /** The table-manifest watermark for `origin` — Long.MinValue when the
    * table is unknown/empty (the POST handler rejects unknown tables
    * before acknowledging anyway). */
  private def manifestSeq(db: String, schema: String, table: String,
                          origin: String): Long =
    (for {
      uuid <- ctx.catalog.getTable(db, schema, table)
      m <- graft.lake.Manifest.readLatest(ctx.catalog.tableRoot(uuid))
      n <- m.syncSeq.get(origin)
    } yield n).getOrElse(Long.MinValue)

  // caller holds the buffer lock
  private def flushKey(key: Key): Long = {
    val batches = queues.remove(key).getOrElse(return -1L)
    try {
      val spark = ctx.spark
      import org.apache.spark.sql.Encoders
      val pkCols = batches.head.pkCols
      val valueCols = batches.head.valueCols
      ctx.locked {
        val uuid = ctx.catalog.getTable(key.db, key.schema, key.table).getOrElse(
          throw new IllegalArgumentException(s"unknown table ${key.schema}.${key.table}"))
        val table = new graft.lake.GraftTable(spark, ctx.catalog.tableRoot(uuid))
        val version = table.retryCommit {
          val m = table.latestManifest
          // PER-BATCH replay filter against the FRESH manifest, inside
          // the retried closure (filter + commit anchor to the same
          // snapshot). With concurrent cross-process sync writers one
          // flush can MIX an already-applied sequence with a new one —
          // an all-or-nothing skip would either re-apply the applied
          // batch (duplicate inserts, materialized changed=false
          // sentinels) or silently drop the new ones. Origin-less
          // batches carry no watermark and are always live.
          val live = batches.filterNot { b =>
            b.origin.zip(b.seq).exists { case (o, n) =>
              m.syncSeq.get(o).exists(_ >= n)
            }
          }
          if (live.isEmpty) m.version
          else {
            val squashed = squashChains(live.iterator.flatMap(_.lines), pkCols, valueCols)
            val all = spark.read.json(spark.createDataset(squashed)(Encoders.STRING))
            // per-origin max over the LIVE window: rides the merge's
            // commit so data + watermark are one atomic unit
            val seqUpdate = live.flatMap(b => b.origin.zip(b.seq))
              .groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).max }
            SyncMerge.applyResolved(table, m, all, pkCols, valueCols, seqUpdate)
          }
        }
        // the historical corruption window: flush committed, catalog
        // watermark not yet advanced. Data + manifest watermark are one
        // atomic commit now, so a death here must be fully redeliverable
        // (scripts/sync_crash_fuzz.py kills at this point and replays)
        graft.lake.Faults.crashPoint("post-sync-commit")
        ctx.markDirty()
        // this flush's window is now at-or-past its marks in the manifest
        // (applied here, or filtered as already applied elsewhere) — keep
        // the enqueue-side cache warm without re-reading the manifest
        batches.flatMap(b => b.origin.zip(b.seq)).groupBy(_._1)
          .foreach { case (o, xs) =>
            val k = (key, o)
            manifestSeqCache(k) =
              math.max(manifestSeqCache.getOrElse(k, Long.MinValue), xs.map(_._2).max)
          }
        // durable watermarks advance only AFTER the merge committed, and
        // never past a LOWER sequence from the same origin still buffered
        // for another table — overshooting would tell the source not to
        // redeliver data a crash could still lose
        val flushedSeqs = batches.flatMap(b => b.origin.zip(b.seq))
          .groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).max }
        val stillBuffered = queues.values.flatten
          .flatMap(b => b.origin.zip(b.seq)).toSeq.groupBy(_._1)
        flushedSeqs.foreach { case (o, n) =>
          val cap = stillBuffered.get(o).map(_.map(_._2).min - 1).getOrElse(n)
          val adv = math.min(n, cap)
          if (adv > Long.MinValue) ctx.catalog.advanceSyncSeq(o, adv)
        }
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

  // --- chain-following squash ----------------------------------------------

  import graft.lake.Manifest.Json
  import graft.lake.Manifest.jstr

  private def unparse(v: Json.V): String = v match {
    case Json.S(s) => jstr(s)
    case Json.N(n) =>
      // integral doubles re-emit as integers so PK/BIGINT columns keep
      // their JSON-inferred type through the rebuild
      if (n.isWhole && math.abs(n) < 9.007199254740992e15) n.toLong.toString else n.toString
    case Json.B(b) => b.toString
    case Json.Null => "null"
    case Json.A(xs) => xs.map(unparse).mkString("[", ",", "]")
    case Json.O(m) => m.map { case (k, x) => jstr(k) + ":" + unparse(x) }.mkString("{", ",", "}")
  }

  /** Fold change rows (in arrival order) into one chain-free row per
    * affected key: old PK = the chain's ORIGINAL identity, new PK = its
    * final one, each value column = the last write with Changed=true (or
    * untouched, keeping the base's). Emits JSON lines SyncMerge can
    * squash trivially (every key appears once, no multi-hop chains). */
  private[sync] def squashChains(lines: Iterator[String],
                                 pkCols: Seq[String], valueCols: Seq[String]): Seq[String] = {
    final class Chain(val origOld: Option[Seq[Json.V]],
                      var curNew: Option[Seq[Json.V]],
                      val vals: mutable.LinkedHashMap[String, (Json.V, Boolean)])
    def keyOf(pks: Seq[Json.V]): String = pks.map(unparse).mkString("\u0000")
    // chains are looked up by their CURRENT new-pk (the next hop's old-pk)
    val byNew = mutable.LinkedHashMap.empty[String, Chain]
    val deletes = mutable.ArrayBuffer.empty[Chain]
    lines.foreach { line =>
      val row = Json.parse(line).asInstanceOf[Json.O].m
      def pkSide(prefix: String): Option[Seq[Json.V]] = {
        val vs = pkCols.map(c => row.getOrElse(s"$prefix$c", Json.Null))
        if (vs.forall(_ == Json.Null)) None else Some(vs)
      }
      val oldPk = pkSide("old_")
      val newPk = pkSide("new_")
      def rowVals: Seq[(String, (Json.V, Boolean))] = valueCols.map { c =>
        val changed = row.get(s"changed_$c") match {
          case Some(Json.B(false)) => false
          case _ => true // no flag = the batch's value applies
        }
        c -> ((row.getOrElse(c, Json.Null), changed))
      }
      val chain = oldPk.map(keyOf).flatMap(byNew.remove) match {
        case Some(ch) => // continues an existing chain: merge values
          ch.curNew = newPk
          rowVals.foreach { case (c, (v, changed)) => if (changed) ch.vals(c) = (v, true) }
          ch
        case None =>
          new Chain(oldPk, newPk, mutable.LinkedHashMap(rowVals: _*))
      }
      newPk match {
        case Some(n) =>
          // a chain already ending at this key loses the race (last write
          // wins) — but its original row was still consumed: keep a delete
          byNew.put(keyOf(n), chain).foreach { displaced =>
            if (displaced.origOld.isDefined) deletes += displaced
          }
        case None => // delete: an insert+delete chain is a no-op
          if (chain.origOld.isDefined) deletes += chain
      }
    }
    def emit(ch: Chain, asDelete: Boolean, seq: Int): String = {
      val olds = pkCols.zipWithIndex.map { case (c, i) =>
        jstr(s"old_$c") + ":" + ch.origOld.map(o => unparse(o(i))).getOrElse("null")
      }
      val news = pkCols.zipWithIndex.map { case (c, i) =>
        jstr(s"new_$c") + ":" + (if (asDelete) "null"
          else ch.curNew.map(n => unparse(n(i))).getOrElse("null"))
      }
      val vals =
        if (asDelete) Seq.empty
        else ch.vals.toSeq.flatMap { case (c, (v, changed)) =>
          Seq(jstr(c) + ":" + unparse(v), jstr(s"changed_$c") + ":" + changed)
        }
      (olds ++ news ++ vals :+ (jstr("_seq") + ":" + seq)).mkString("{", ",", "}")
    }
    val out = Seq.newBuilder[String]
    var i = 0
    deletes.foreach { ch => out += emit(ch, asDelete = true, i); i += 1 }
    byNew.values.foreach { ch => out += emit(ch, asDelete = false, i); i += 1 }
    out.result()
  }
}
