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
  * only one emitted; production deployments would expire tombstones
  * with an event-time timeout TTL (the standard memory/exactness
  * trade — kept exact here).
  *
  * Events are folded in event-time order within each micro-batch (the
  * iterator itself is unordered); cross-batch reordering shares the
  * ordered-ingest assumption of the other §2.5 gates (hive-hour raw
  * zone, `AvailableNow` replay).
  */
object StatefulFunnel {

  case class FunnelEvent(user_id: String, event: String, event_ts: Timestamp)
  case class FunnelState(times: Seq[Long], done: Boolean)
  case class Completion(user_id: String, stage_ts: Seq[Timestamp])

  /** Detect funnel completions on a parsed weblog stream (needs
    * `user_id`, `event`, `event_ts`). `stages` are matched against the
    * `event` column in order; one append-mode row per user, emitted in
    * the micro-batch where the last stage first unlocks.
    */
  def completions(parsed: DataFrame, stages: Seq[String]): Dataset[Completion] = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size,
      "stage event types must be distinct (the machine keys on indexOf)")
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .select(col("user_id"), col("event"), col("event_ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(stages))
  }

  private val Unset = Long.MaxValue

  private def process(stages: Seq[String])(
      userId: String,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[Completion] = {
    val n = stages.size
    val prev = state.getOption.getOrElse(FunnelState(Seq.fill(n)(Unset), done = false))
    if (prev.done) return Iterator.empty // already emitted; swallow the rest

    val times = prev.times.toArray
    var done = false
    val it = events.toSeq.sortBy(_.event_ts.getTime).iterator
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
    state.update(FunnelState(times.toSeq, done))
    if (done) Iterator.single(Completion(userId, times.toSeq.map(new Timestamp(_))))
    else Iterator.empty
  }
}
