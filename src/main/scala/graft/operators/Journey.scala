package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over a clickstream: ordered funnels, cohort
  * retention, per-entry-page bounce rates, and page-transition
  * probabilities. These are the classic web-analytics shapes the
  * reference's Athena workgroup exists to serve
  * (`web-analytics-parquet/cdk_stacks/athena_workgroup.py:46-47` — "any
  * SQL over the web-log tables"); here they are first-class distributed
  * operators.
  *
  * Scale notes: every operator shuffles on `user_id` (or the page key for
  * the final small aggregate) — the same key the reference's Kinesis
  * ingest shards by, so on a pre-bucketed lake these are co-located
  * joins. No operator ever collects per-user state to the driver; funnel
  * stage timestamps ride per-user hash-aggregate rows (a few bytes each),
  * and the page-level outputs are bounded by the page-vocabulary size,
  * not the event count.
  */
object Journey {

  /** Ordered-funnel stage times: for each user, the earliest completion
    * time of each stage, where stage i+1 must happen strictly AFTER the
    * user's earliest stage-i completion (the standard "first-touch"
    * funnel). Returns one row per user who completed stage 1, with
    * nullable `t1..tN` timestamps.
    *
    * Each stage is one hash aggregate on `userCol` plus one join back to
    * the (already user-partitioned) events — N-1 shuffle-free stages
    * under co-partitioning, and the per-stage frame shrinks
    * monotonically (stage-k completers ⊆ stage-(k-1) completers).
    */
  def funnelStageTimes(events: DataFrame, stages: Seq[Column],
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage predicate")
    val u = col(userCol)
    var acc = events.filter(stages.head)
      .groupBy(u).agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).foreach { case (pred, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val next = events.filter(pred)
        .select(u.as("_u"), col(tsCol).as("_ts"))
        .join(acc, col("_u") === u && col("_ts") > col(prev))
        .groupBy(col("_u").as(userCol)).agg(min(col("_ts")).as(cur))
      acc = acc.join(next.select(col(userCol).as("_ju"), col(cur)),
        u === col("_ju"), "left").drop("_ju")
    }
    acc
  }

  /** Funnel summary: one row of per-stage completer counts and
    * step-to-step conversion rates (rounded double, cross-engine
    * deterministic).
    */
  def funnel(events: DataFrame, stages: Seq[Column],
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val times = funnelStageTimes(events, stages, userCol, tsCol)
    val counts = times.agg(
      count(col("t1")).as("n_stage1"),
      (2 to stages.size).map(i => count(col(s"t$i")).as(s"n_stage$i")): _*)
    val convs = (2 to stages.size).map { i =>
      round(col(s"n_stage$i").cast("double") /
        col(s"n_stage${i - 1}").cast("double"), 6).as(s"conv_${i - 1}_$i")
    }
    counts.select(col("*") +: convs: _*)
  }

  /** Weekly cohort retention: users are cohorted by the Monday-truncated
    * week of their first event; output is one row per
    * (cohort_week, week_offset) with the distinct active-user count.
    * Two shuffles: first-seen per user, then the (cohort, week) distinct
    * — both key on columns with bounded cardinality after the first
    * user-level aggregate.
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val u = col(userCol)
    val week = to_date(date_trunc("week", col(tsCol)))
    val firstSeen = events.groupBy(u)
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val active = events.select(u, week.as("active_week")).distinct()
    active.join(firstSeen, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / lit(7))
          .cast("int").as("week_offset"))
      .agg(countDistinct(u).as("n_users"))
  }

  /** Adds the session ordinal and the page key, then the next page within
    * the same session (`lead` over the user/session window; event id
    * breaks timestamp ties deterministically).
    */
  private def sessionPages(events: DataFrame, pageCol: Column): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    Sessionize.withSessionIds(events)
      .withColumn("page", pageCol)
      .withColumn("next_page", lead(col("page"), 1).over(w))
  }

  /** Within-session (page, next_page) edge counts — the click graph.
    * The heavy lifting is the sessionize shuffle on `user_id`; the edge
    * aggregate keys on the page vocabulary, which is small by
    * construction. Feeds both [[pageTransitions]] and
    * [[Graph.pageRank]].
    */
  def transitionEdges(events: DataFrame, pageCol: Column): DataFrame =
    sessionPages(events, pageCol)
      .filter(col("next_page").isNotNull)
      .groupBy(col("page"), col("next_page"))
      .agg(count(lit(1)).as("cnt"))

  /** Page-transition counts and per-source probabilities within sessions:
    * one row per observed (page, next_page) edge. The per-source
    * normalizing window keys on the page vocabulary.
    */
  def pageTransitions(events: DataFrame, pageCol: Column): DataFrame = {
    val wSrc = Window.partitionBy(col("page"))
    transitionEdges(events, pageCol).withColumn("prob",
      round(col("cnt").cast("double") /
        sum(col("cnt")).over(wSrc).cast("double"), 6))
  }

  /** Per-entry-page bounce rate: sessions are attributed to their first
    * page; a bounce is a single-event session. One row per entry page.
    */
  def bounceRate(events: DataFrame, pageCol: Column): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val sess = Sessionize.withSessionIds(events)
      .withColumn("page", pageCol)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        max(when(col("rn") === 1, col("page"))).as("entry_page"),
        count(lit(1)).as("n_events"))
    sess.groupBy(col("entry_page"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        round(col("n_bounces").cast("double") /
          col("n_sessions").cast("double"), 6))
  }
}
