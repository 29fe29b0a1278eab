package graft.lake

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Crash-fault injection seam for the commit ladder. The write path's
  * durability story has three boundaries a process can die at (the same
  * atomicity legs Delta's commit protocol defends, reference
  * `src/context/delta.rs:429-440`):
  *
  *   - `pre-manifest`   — data parquet written, manifest not yet
  *                        published: the version MUST NOT exist; the
  *                        parquet is an orphan VACUUM collects;
  *   - `post-manifest`  — manifest published, latest-hint not yet
  *                        updated: the version IS committed; readers
  *                        must resolve it by probing past the stale hint;
  *   - `vacuum-sweep`   — mid-deletion sweep: retained versions must
  *                        stay fully readable; a re-run completes the
  *                        sweep (idempotent keep-set).
  *
  * `crashPoint(name)` is a no-op unless the `GRAFT_CRASH_AT` environment
  * variable names the point: `"<name>:<n>"` halts the JVM at the n-th
  * armed hit of `<name>` via `Runtime.halt` — no shutdown hooks, no
  * flushing, the in-process equivalent of `kill -9` at exactly that
  * ladder step. The harness (graft.tools.CrashDmlRun driven by
  * scripts/crash_fuzz.py) runs seeded DML under sampled kill points and
  * after every kill verifies the table reads exactly the last committed
  * version (DuckDB replay of the committed statement prefix), resumes
  * the writer, and finally asserts VACUUM collects every orphan.
  *
  * Production cost: one volatile read of an empty map reference per
  * commit — `spec` is parsed once at class load and is empty when the
  * env var is unset.
  */
object Faults {

  /** Parsed "name:n[,name:n]*" spec; empty (the common case) disables
    * every point at a single map-isEmpty check. */
  private val spec: Map[String, Long] =
    sys.env.get("GRAFT_CRASH_AT").map { s =>
      s.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { part =>
        val i = part.lastIndexOf(':')
        require(i > 0, s"bad GRAFT_CRASH_AT entry: $part (want name:n)")
        part.substring(0, i) -> part.substring(i + 1).toLong
      }.toMap
    }.getOrElse(Map.empty)

  /** Setup phases (table creation, data seeding) run disarmed so the
    * sampled hit count targets the statement phase under test. */
  @volatile private var armed = true
  def arm(): Unit = armed = true
  def disarm(): Unit = armed = false

  private val hits = new ConcurrentHashMap[String, AtomicLong]()

  /** In-process interrupt seam: invoked at every armed crash point with
    * the point's name BEFORE the halt check. The cancellation tests bind
    * `Statements.cancel` here to land a cancel at an exact commit-ladder
    * phase (the async-cancel twin of the kill -9 harness — same
    * boundaries, statement survives to observe the outcome). Process-wide,
    * default no-op: production cost is one volatile read per point. */
  @volatile var onPoint: String => Unit = _ => ()

  /** Exit code a planted crash halts with — distinguishes "died at the
    * planted point" from any real failure in the harness. */
  val HaltExitCode = 137

  def crashPoint(name: String): Unit = {
    onPoint(name)
    if (spec.nonEmpty && armed) {
      spec.get(name).foreach { n =>
        val c = hits.computeIfAbsent(name, _ => new AtomicLong).incrementAndGet()
        if (c == n) {
          // stderr only — visible in the harness log, nothing buffered
          System.err.println(s"[graft-fault] halting at crash point '$name' hit $n")
          Runtime.getRuntime.halt(HaltExitCode)
        }
      }
    }
  }
}
