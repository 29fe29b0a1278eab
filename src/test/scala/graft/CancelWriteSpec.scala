package graft

import graft.lake.{Faults, GraftTable, LakeIO, Manifest}
import graft.server.Statements
import graft.sql.GraftContext
import graft.sync.SyncBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Cancellation fired INTO the write path — the round-16 gap: PgSpec/
  * HttpSpec cancel long reads, but nothing proved a cancel landing inside
  * a DML/sync commit ladder leaves the table intact. The contract under
  * test (documented at GraftTable.retryCommit / Statements):
  *
  *   - a cancel landing while the rewrite JOBS run aborts the statement
  *     with [[Statements.Cancelled]] and NO version is published — the
  *     abandoned attempt's parquet is VACUUM's documented garbage;
  *   - a cancel landing AFTER the last job but before the manifest CAS
  *     (the `pre-manifest` ladder point) cannot stop the driver-side
  *     commit: the statement completes ATOMICALLY (pg's best-effort
  *     between-jobs cancel semantics) — never a partial version;
  *   - a cancelled sync flush re-queues its batches (SyncBuffer's catch)
  *     and the NEXT flush applies them exactly once, watermarks intact.
  */
class CancelWriteSpec extends SparkSpec {

  private def parquetFiles(root: String): Seq[String] =
    LakeIO.listFilesRecursive(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))

  /** Cancels `gid` as soon as the scheduler reports its first job —
    * mid-flight for any rewrite whose tasks outlive listener dispatch. */
  private def cancelOnFirstJob(gid: String): SparkListener = new SparkListener {
    override def onJobStart(jobStart: SparkListenerJobStart): Unit =
      if (jobStart.properties != null &&
          gid == jobStart.properties.getProperty("spark.jobGroup.id"))
        Statements.cancel(spark, gid, s"test cancel of $gid mid-job")
  }

  test("cancel mid-UPDATE rewrite: Cancelled, no partial version, orphans swept, session usable") {
    val ctx = new GraftContext(spark, tmpDir("graft-cupd"))
    // 2 ms/row across 4 threads stretches the rewrite job to ~1 s — the
    // listener's cancel lands while tasks are genuinely running
    spark.udf.register("slow_id", (x: Long) => { Thread.sleep(2L); x })
    ctx.execute("CREATE TABLE cw (id BIGINT, v BIGINT)")
    ctx.execute("INSERT INTO cw SELECT id, id FROM range(2000)")
    val root = ctx.catalog.tableRoot(ctx.catalog.getTable("default", "public", "cw").get)
    val v0 = Manifest.latestVersion(root).get
    val gid = Statements.newGroupId("cancelwrite")
    val l = cancelOnFirstJob(gid)
    spark.sparkContext.addSparkListener(l)
    try {
      intercept[Statements.Cancelled] {
        Statements.run(spark, gid, "update cw", 0) {
          ctx.execute("UPDATE cw SET v = slow_id(v) + 1")
        }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    // no partial version: the manifest chain ends exactly where it was
    assert(Manifest.latestVersion(root) === Some(v0))
    // content untouched — the abandoned attempt is invisible to readers
    val r = ctx.execute("SELECT count(*) AS n, sum(v) AS s FROM cw").collect().head
    assert(r.getLong(0) === 2000L && r.getLong(1) === (0L until 2000L).sum)
    // the abandoned attempt's parquet is VACUUM's garbage: after an
    // explicit sweep, every surviving data file is manifest-referenced
    new GraftTable(spark, root).vacuum()
    assert(parquetFiles(root).size === Manifest.read(root, v0).files.size)
    // session usable: the next statement (same thread, fresh group) works
    ctx.execute("UPDATE cw SET v = v + 1")
    val r2 = ctx.execute("SELECT sum(v) AS s FROM cw").collect().head
    assert(r2.getLong(0) === (0L until 2000L).sum + 2000L)
  }

  test("cancel between the last write job and the manifest CAS: commit completes atomically") {
    val ctx = new GraftContext(spark, tmpDir("graft-cpre"))
    ctx.execute("CREATE TABLE cw2 (id BIGINT, v BIGINT)")
    ctx.execute("INSERT INTO cw2 SELECT id, id FROM range(100)")
    val root = ctx.catalog.tableRoot(ctx.catalog.getTable("default", "public", "cw2").get)
    val v0 = Manifest.latestVersion(root).get
    val gid = Statements.newGroupId("cancelwrite")
    val me = Thread.currentThread()
    // fire the cancel at the exact ladder point, only for OUR statement
    // (the seam is process-wide; other suites commit concurrently)
    Faults.onPoint = name =>
      if (name == "pre-manifest" && (Thread.currentThread() eq me))
        Statements.cancel(spark, gid, "cancel at pre-manifest")
    try {
      // data files are written, stats collected, cancel is now pending —
      // the remaining work is driver-side manifest IO, which a job-group
      // cancel cannot (and must not) tear mid-way: the statement finishes
      Statements.run(spark, gid, "update cw2", 0) {
        ctx.execute("UPDATE cw2 SET v = v + 1")
      }
    } finally Faults.onPoint = _ => ()
    assert(Manifest.latestVersion(root) === Some(v0 + 1)) // exactly one new version
    val r = ctx.execute("SELECT count(*) AS n, sum(v) AS s FROM cw2").collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === (0L until 100L).sum + 100L) // FULL update, no partial
  }

  test("cancelled sync flush re-queues its batches; the retried flush applies exactly once") {
    val ctx = new GraftContext(spark, tmpDir("graft-csync"))
    ctx.execute("CREATE TABLE st (id BIGINT, v BIGINT)")
    val buf = new SyncBuffer(ctx, maxRows = 1000000, maxBatches = 1000, maxAgeMs = 0)
    val lines = (1 to 500).map(i => s"""{"old_id":null,"new_id":$i,"v":$i,"_seq":$i}""").toArray
    assert(buf.add("default", "public", "st", lines, Seq("id"), Seq("v"),
      Some("o1"), Some(10L)).isInstanceOf[buf.Buffered])
    val gid = Statements.newGroupId("cancelwrite")
    val l = cancelOnFirstJob(gid)
    spark.sparkContext.addSparkListener(l)
    try {
      intercept[Statements.Cancelled] {
        Statements.run(spark, gid, "sync flush", 0)(buf.flushAged())
      }
    } finally spark.sparkContext.removeSparkListener(l)
    // nothing committed by the torn flush...
    val root = ctx.catalog.tableRoot(ctx.catalog.getTable("default", "public", "st").get)
    assert(Manifest.readLatest(root).get.syncSeq.get("o1") === None)
    // ...and the batches survived (re-queued, original order): a fresh
    // flush — NEW job group; sticky cancellation poisons reuse — applies
    // them exactly once, data + manifest watermark one atomic commit
    buf.flushAll()
    val r = ctx.execute("SELECT count(*) AS n, sum(v) AS s FROM st").collect().head
    assert(r.getLong(0) === 500L && r.getLong(1) === (1L to 500L).sum)
    assert(Manifest.readLatest(root).get.syncSeq.get("o1") === Some(10L))
    // redelivery of the flushed window is acknowledged, not re-applied
    assert(buf.add("default", "public", "st", lines, Seq("id"), Seq("v"),
      Some("o1"), Some(10L)).isInstanceOf[buf.Skipped])
  }
}
