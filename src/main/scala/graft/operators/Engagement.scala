package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Engagement KPIs over the clickstream: rolling active-user counts
  * (DAU / WAU / MAU with stickiness ratios) and the power-user activity
  * histogram — the dashboard staples a web-analytics lake serves daily
  * (`web-analytics-parquet/cdk_stacks/athena_workgroup.py:46-47`).
  *
  * Scale notes: rolling distincts never window over raw events. The
  * event stream first collapses to distinct `(user, day)` pairs — one
  * shuffle, output bounded by users × days — and each pair then
  * *contributes itself forward* into the ≤ `maxWindow` window-end days
  * it belongs to (a scan-stage explode of the collapsed frame, the
  * standard map-side rewrite of a rolling COUNT DISTINCT). The
  * per-day aggregate keys on (day), so no executor ever holds more
  * than one day's membership. For the approximate path at extreme
  * user counts, the HLL sketches in `functions/Sketches` merge across
  * days instead (q_hll_union proves mergeability).
  */
object Engagement {

  /** One row per observed activity day: `dau`, `wau` (trailing
    * `weekWindow` days), `mau` (trailing `monthWindow` days), and the
    * DAU/WAU, DAU/MAU stickiness ratios (6-decimal, engine-portable).
    * Only days with at least one event are reported.
    */
  def rollingActive(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", weekWindow: Int = 7,
      monthWindow: Int = 28): DataFrame = {
    require(weekWindow >= 1 && monthWindow >= weekWindow,
      "windows must be positive and month ≥ week")
    val ud = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .distinct()
      .localCheckpoint(true) // users × days; feeds all three rollups

    def rolled(w: Int, name: String): DataFrame =
      ud.select(col("_u"),
          explode(sequence(col("_d"), date_add(col("_d"), w - 1))).as("day"))
        .groupBy("day").agg(countDistinct(col("_u")).as(name))

    val dau = ud.groupBy(col("_d").as("day"))
      .agg(countDistinct(col("_u")).as("dau"))
    dau
      .join(rolled(weekWindow, "wau"), "day")
      .join(rolled(monthWindow, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        PortableRound.r6(col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness_w"),
        PortableRound.r6(col("dau").cast("double") / col("mau").cast("double"))
          .as("stickiness_m"))
      .orderBy("day")
  }

  /** Power-user curve: users bucketed by their total event count
    * (`floor(n / bucketWidth) · bucketWidth` lower bounds), with the
    * user and event mass per bucket. Two cascaded aggregates — the
    * first keys on the user, the second on the (tiny) bucket
    * vocabulary.
    */
  def activityHistogram(events: DataFrame, bucketWidth: Long = 10,
      userCol: String = "user_id"): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    events.groupBy(col(userCol).as("_u")).agg(count(lit(1)).as("_n"))
      .groupBy((floor(col("_n") / bucketWidth) * bucketWidth).as("bucket_lo"))
      .agg(count(lit(1)).as("n_users"), sum(col("_n")).as("n_events"))
      .orderBy("bucket_lo")
  }
}
