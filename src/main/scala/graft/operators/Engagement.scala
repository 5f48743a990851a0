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

  /** The collapsed (user, day) activity frame every engagement KPI
    * starts from — one shuffle, output bounded by users × days.
    */
  private def userDays(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .distinct()
      .localCheckpoint(true)

  /** One row per observed activity day: `dau`, `wau` (trailing
    * `weekWindow` days), `mau` (trailing `monthWindow` days), and the
    * DAU/WAU, DAU/MAU stickiness ratios (6-decimal, engine-portable).
    * Only days with at least one event are reported.
    *
    * One contribution-explode to the `monthWindow` horizon feeds all
    * three distinct counts as conditional aggregates of the same
    * frame — a single shuffle, no joins.
    */
  def rollingActive(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", weekWindow: Int = 7,
      monthWindow: Int = 28): DataFrame = {
    require(weekWindow >= 1 && monthWindow >= weekWindow,
      "windows must be positive and month ≥ week")
    userDays(events, userCol, tsCol)
      .select(col("_u"), col("_d"),
        explode(sequence(col("_d"), date_add(col("_d"), monthWindow - 1)))
          .as("day"))
      .groupBy("day")
      .agg(
        countDistinct(when(col("day") === col("_d"), col("_u"))).as("dau"),
        countDistinct(when(datediff(col("day"), col("_d")) < weekWindow,
          col("_u"))).as("wau"),
        countDistinct(col("_u")).as("mau"))
      .filter(col("dau") > 0) // report only days with direct activity
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        PortableRound.r6(col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness_w"),
        PortableRound.r6(col("dau").cast("double") / col("mau").cast("double"))
          .as("stickiness_m"))
      .orderBy("day")
  }

  /** New-vs-returning split per activity day: a user is "new" on their
    * first-ever active day, "returning" after. Two aggregates over the
    * collapsed (user, day) frame — first-seen per user, then the
    * per-day split.
    */
  def newVsReturning(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val ud = userDays(events, userCol, tsCol)
    val first = ud.groupBy(col("_u").as("_fu")).agg(min(col("_d")).as("_first"))
    ud.join(first, col("_u") === col("_fu"))
      .groupBy(col("_d").as("day"))
      .agg(count(lit(1)).as("dau"),
        count(when(col("_d") === col("_first"), 1)).as("new_users"))
      .withColumn("returning", col("dau") - col("new_users"))
      .orderBy("day")
  }

  /** Cohort lifetime-value curve: users cohorted by the Monday week of
    * their first event; one row per (cohort_week, week_offset) with the
    * cohort size, that week's revenue, the running cumulative revenue,
    * and cumulative LTV per cohort user. Revenue accumulates as
    * DECIMAL(18,2) (exact, order-independent); the running sum windows
    * over the aggregated (cohorts × offsets) frame, never raw events.
    */
  def cohortLtv(events: DataFrame, valueCol: String = "value",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val firstSeen = Journey.firstSeenWeek(events, userCol, tsCol)
      .withColumnRenamed(userCol, "_fu")
      .localCheckpoint(true)
    val sized = firstSeen.groupBy(col("cohort_week").as("_cw"))
      .agg(count(lit(1)).as("cohort_size"))
    val rev = events
      .select(col(userCol).as("_u"), to_date(date_trunc("week", col(tsCol))).as("_w"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("_v"))
      .join(firstSeen, col("_u") === col("_fu"))
      .groupBy(col("cohort_week"),
        (datediff(col("_w"), col("cohort_week")) / lit(7)).cast("int")
          .as("week_offset"))
      .agg(sum(col("_v")).as("_rev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
    rev.withColumn("_cum", sum(col("_rev")).over(w))
      .join(sized, col("cohort_week") === col("_cw"))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("cohort_size"),
        col("_rev").cast("double").as("revenue"),
        col("_cum").cast("double").as("cum_revenue"),
        PortableRound.r6(col("_cum").cast("double") /
          col("cohort_size").cast("double")).as("ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
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
