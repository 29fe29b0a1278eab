package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * custom-state path for semantics tumbling windows can't express
  * (variable-length sessions closed by inactivity). Batch twin:
  * graft.queries.Events ev2_sessionize (gap-based window sessionization).
  */
object StatefulSessions {

  case class Event(user_id: Long, tsUs: Long, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  /** Sessions closed after `gapUs` of inactivity (event-time, per user).
    * With `flushTimeout = ProcessingTimeTimeout` (production default) idle
    * users flush on the next trigger after the gap elapses in wall time —
    * the structured-streaming-native analog of the reference's
    * replication-lag flush bound (`src/sync/writer.rs:336-387`). Pass
    * NoTimeout for deterministic tests (sessions then close only when a
    * later event proves the gap). */
  def sessionize(events: Dataset[Event], gapUs: Long,
                 flushTimeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, flushTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.end, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsUs - s.end <= gapUs =>
                  cur = Some(SessionState(s.start, e.tsUs, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(user, s.start, s.end, s.n, s.total)
                  cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (flushTimeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapUs / 1000)
            }
            closed.result().iterator
          }
      }
  }
}
