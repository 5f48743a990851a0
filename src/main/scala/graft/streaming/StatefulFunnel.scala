package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Real-time funnel-completion detection on the stream
  * (SURVEY.md §2.5 "stateful ops"): emit one row the moment a user
  * finishes the whole ordered funnel — the streaming twin of
  * [[graft.operators.Journey.funnelStageTimes]] restricted to full
  * completions, with the same strict first-touch semantics (stage i+1
  * counts only strictly after the user's EARLIEST stage-i completion).
  * This is the "trigger an action when a user converts" shape a
  * web-analytics pipeline serves in real time.
  *
  * State per user is O(#stages) longs (earliest completion time per
  * stage), keyed by `user_id` — the reference's Kinesis shard key, so
  * state spreads evenly across a large cluster. A completed user
  * collapses to a tombstone flag so the first completion is also the
  * only one emitted.
  *
  * State is BOUNDED by an event-time TTL (`retention`): every entry —
  * in-progress funnel or tombstone — expires once the watermark passes
  * its last activity plus the retention horizon
  * (`GroupStateTimeout.EventTimeTimeout`, the same pattern as
  * [[StatefulSessionizer]]), so the store holds only the retention
  * window's active users, not every user ever seen. Exactness contract
  * under TTL: events older than the watermark are dropped BEFORE the
  * operator, so a replay of an expired user's ORIGINAL events cannot
  * re-emit; only a genuinely new post-expiry completion (fresh event
  * times inside the watermark) emits again — the standard
  * retention/exactness trade, sized by `retention`.
  *
  * Events are folded in event-time order within each micro-batch (the
  * iterator itself is unordered); cross-batch reordering shares the
  * ordered-ingest assumption of the other §2.5 gates (hive-hour raw
  * zone, `AvailableNow` replay).
  */
object StatefulFunnel {

  case class FunnelEvent(user_id: String, event: String, event_ts: Timestamp)
  case class FunnelState(times: Seq[Long], done: Boolean, lastSeen: Long)
  case class Completion(user_id: String, stage_ts: Seq[Timestamp])

  /** Detect funnel completions on a parsed weblog stream (needs
    * `user_id`, `event`, `event_ts`). `stages` are matched against the
    * `event` column in order; one append-mode row per user, emitted in
    * the micro-batch where the last stage first unlocks. `watermark`
    * bounds late arrivals; `retention` bounds per-user state lifetime
    * from the user's last observed event.
    */
  def completions(parsed: DataFrame, stages: Seq[String],
      watermark: String = "1 hour",
      retention: String = "30 days"): Dataset[Completion] = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size,
      "stage event types must be distinct (the machine keys on indexOf)")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(retention))
    require(iv.months == 0, "retention must be day/time based (no calendar months)")
    val retentionMs = iv.days * 86400000L + iv.microseconds / 1000L
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .withWatermark("event_ts", watermark)
      .select(col("user_id"), col("event"), col("event_ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(stages, retentionMs))
  }

  private val Unset = Long.MaxValue

  private def process(stages: Seq[String], retentionMs: Long)(
      userId: String,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[Completion] = {
    if (state.hasTimedOut) {
      // retention horizon passed the user's last activity: expire the
      // entry (tombstone or in-progress funnel alike).
      state.remove()
      return Iterator.empty
    }
    val n = stages.size
    val prev = state.getOption
      .getOrElse(FunnelState(Seq.fill(n)(Unset), done = false, lastSeen = Long.MinValue))
    // lastSeen only ever advances (a batch of older-but-in-watermark
    // events must not shrink the retention window), and it keeps
    // advancing for a DONE user too — the tombstone's lifetime follows
    // the user's last activity, so an active user's tombstone cannot
    // expire under them (which would let an in-watermark redelivery
    // re-emit their completion).
    val buffer = Seq.newBuilder[FunnelEvent]
    val batchMax = events.foldLeft(prev.lastSeen) { (acc, e) =>
      val t = e.event_ts.getTime
      if (!prev.done) buffer += e
      math.max(acc, t)
    }
    if (prev.done) {
      state.update(prev.copy(lastSeen = batchMax))
      state.setTimeoutTimestamp(batchMax + retentionMs)
      return Iterator.empty // already emitted; swallow the rest
    }

    val times = prev.times.toArray
    var done = false
    val it = buffer.result().sortBy(_.event_ts.getTime).iterator
    while (!done && it.hasNext) {
      val e = it.next()
      val t = e.event_ts.getTime
      val i = stages.indexOf(e.event)
      if (i == 0) {
        if (t < times(0)) times(0) = t
      } else if (i > 0 && times(i - 1) != Unset && t > times(i - 1) && t < times(i)) {
        times(i) = t
      }
      done = times(n - 1) != Unset
    }
    state.update(FunnelState(times.toSeq, done, batchMax))
    if (batchMax != Long.MinValue)
      state.setTimeoutTimestamp(batchMax + retentionMs)
    if (done) Iterator.single(Completion(userId, times.toSeq.map(new Timestamp(_))))
    else Iterator.empty
  }
}
