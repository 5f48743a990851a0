package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (SURVEY.md §2.4:
  * "sessionization metrics: events/session, session duration").
  *
  * The reference's web-log events carry an explicit `session_id`
  * (`web-analytics-iceberg/src/utils/gen_fake_data.py:53`); the driver's
  * `events` table does not, so we derive sessions the standard way: a new
  * session starts when the gap to the user's previous event exceeds
  * `gapSeconds`.
  *
  * Scale notes: one shuffle on `user_id` (the window partition key) — the
  * same partitioning the reference's Kinesis ingest uses
  * (`gen_fake_data.py:72-73` keys records by userId). Per-user state is a
  * running sum inside a sorted partition, so memory is O(1) per row and the
  * plan stays inside whole-stage codegen. At 100 TB a skewed power-user key
  * would bound a single task by that user's event count — acceptable for
  * clickstream (users are small); otherwise pre-split by (user_id, day).
  */
object Sessionize {

  /** Adds `session_seq` (per-user session ordinal, 1-based) and
    * `gap_us` (microseconds since the user's previous event, null for the
    * first event).
    */
  def withSessionIds(events: DataFrame, gapSeconds: Long = 1800,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("gap_us", unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("session_seq",
        sum(when(col("gap_us").isNull || col("gap_us") > gapSeconds * 1000000L, 1)
          .otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: event count and exact duration in microseconds. */
  def sessions(events: DataFrame, gapSeconds: Long = 1800,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    withSessionIds(events, gapSeconds, userCol, tsCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("duration_us"),
        min(col(tsCol)).as("session_start"))
}
