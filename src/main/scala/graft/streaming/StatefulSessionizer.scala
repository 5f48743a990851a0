package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization on the stream via
  * `flatMapGroupsWithState` (SURVEY.md §2.5 "stateful ops") — the
  * hand-rolled twin of `session_window`, for when session emission needs
  * custom logic (per-session event caps, mid-session emission, enriched
  * summaries) that the built-in window can't express.
  *
  * State per user is O(1) (running count + bounds), keyed by `user_id` —
  * the same key Kinesis shards on, so a 1000-executor cluster spreads
  * state evenly. Sessions close via event-time timeout at
  * watermark > last event + gap; the watermark bounds state size.
  */
object StatefulSessionizer {

  case class SessionEvent(user_id: String, event_ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(
      user_id: String,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Sessionize a parsed weblog stream (needs `user_id`, `event_ts`).
    * Emits one row per CLOSED session (append semantics).
    */
  def closedSessions(parsed: DataFrame, gapSeconds: Long = 1800,
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .withWatermark("event_ts", watermark)
      .select(col("user_id"), col("event_ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapSeconds * 1000L))
  }

  private def process(gapMs: Long)(
      userId: String,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    var closed = List.empty[ClosedSession]

    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events: close the session
      state.getOption.foreach { s =>
        closed ::= ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
      }
      state.remove()
      return closed.iterator
    }

    var cur = state.getOption
    events.toSeq.sortBy(_.event_ts.getTime).foreach { e =>
      val t = e.event_ts.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
        case Some(s) =>
          closed ::= ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last + gapMs)
    }
    closed.reverse.iterator
  }
}
