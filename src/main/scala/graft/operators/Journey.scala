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
  /** One row per user with the Monday-truncated week of their first
    * event — the cohort frame shared by [[retentionCohorts]] and
    * [[Engagement.cohortLtv]] (and mirrored by both oracles).
    */
  private[operators] def firstSeenWeek(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))

  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val u = col(userCol)
    val week = to_date(date_trunc("week", col(tsCol)))
    val firstSeen = firstSeenWeek(events, userCol, tsCol)
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

  /** Top session paths: the most frequent within-session event-type
    * n-grams (default trigrams), the classic "what do users do next"
    * path-mining view. The n-gram build is `lead` inside the existing
    * user/session window (no extra shuffle past sessionize); the final
    * top-k compiles to TakeOrderedAndProject — per-partition heaps, no
    * global sort.
    */
  def sessionPaths(events: DataFrame, len: Int = 3, k: Int = 20): DataFrame = {
    require(len >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val steps = (1 until len).foldLeft(
      Sessionize.withSessionIds(events).withColumn("_s0", col("event_type"))) {
      (df, i) => df.withColumn(s"_s$i", lead(col("event_type"), i).over(w))
    }
    steps
      .filter((1 until len).map(i => col(s"_s$i").isNotNull).reduce(_ && _))
      .withColumn("path",
        concat_ws(">", (0 until len).map(i => col(s"_s$i")): _*))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }

  /** Letter alphabet for session-sequence patterns: one distinct
    * character per event type (initials collide: visit/view, list/like).
    */
  val eventLetters: Seq[(String, String)] = Seq(
    "visit" -> "i", "view" -> "v", "list" -> "l",
    "like" -> "k", "cart" -> "c", "purchase" -> "p")

  /** CEP-style sequence-pattern matching over sessions — the
    * MATCH_RECOGNIZE / Flink-CEP question ("which sessions follow this
    * behavioral shape?") composed from Spark primitives instead of a
    * state-machine runtime: each session collapses to its ordered
    * event-letter string (ONE aggregation; the string is O(session
    * length), deterministic order by (ts, event_id)), and every
    * pattern is a regex over that tiny string — a broadcast join of
    * the pattern list against the session strings, never a re-scan of
    * events per pattern. `patterns` = (name, regex over the
    * [[eventLetters]] alphabet); regexes must stay in the
    * Java-regex/RE2 common subset so any engine replays them.
    */
  def sessionPatterns(events: DataFrame,
      patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "no patterns to match")
    val letter = eventLetters.foldLeft(lit("x")) { case (acc, (t, c)) =>
      when(col("event_type") === t, lit(c)).otherwise(acc)
    }
    val strs = Sessionize.withSessionIds(events)
      .withColumn("_letter", letter)
      .groupBy("user_id", "session_seq")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ts, event_id, _letter))), x -> x._letter), '')")
        .as("sq"))
    import events.sparkSession.implicits._
    val pats = patterns.toDF("pattern", "re")
    strs.join(broadcast(pats), expr("sq rlike re"))
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("pattern")
  }

  /** Ulp-portable 6-decimal grid — see [[PortableRound]]. */
  private def round6p(c: Column): Column = PortableRound.r6(c)

  /** Deterministic A/B experiment readout: users are split into two arms
    * by the parity of the replayable 60-bit md5 key hash
    * (`Dedup.md5WordHash` — any engine can reproduce the assignment), a
    * user converts if any event matches `convPred`, and the arms are
    * compared with the standard two-proportion pooled z-test. One output
    * row. One shuffle (per-user conversion aggregate); the z arithmetic
    * runs on a single row.
    */
  def abTest(events: DataFrame, convPred: Column,
      userCol: String = "user_id"): DataFrame = {
    val u = col(userCol)
    val users = events.groupBy(u)
      .agg(max(when(convPred, 1L).otherwise(0L)).as("_conv"))
      .withColumn("_arm",
        when(pmod(Dedup.md5WordHash(u.cast("string")), lit(2L)) === 0, "A")
          .otherwise("B"))
    val agg = users.agg(
      count(when(col("_arm") === "A", 1)).as("n_a"),
      count(when(col("_arm") === "B", 1)).as("n_b"),
      sum(when(col("_arm") === "A", col("_conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("_arm") === "B", col("_conv")).otherwise(0L)).as("conv_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (ca, cb) = (col("conv_a").cast("double"), col("conv_b").cast("double"))
    val p = (ca + cb) / (na + nb)
    // zero pooled variance (nobody or everybody converts) or an empty arm
    // leaves the test undefined — emit z = 0 / not-significant (and a
    // null rate for an empty arm) rather than dividing by zero, which
    // ANSI mode rightly rejects.
    val z = when(na > 0.0 && nb > 0.0 && p * (lit(1.0) - p) > 0.0,
      (ca / na - cb / nb) /
        sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb)))
      .otherwise(lit(0.0))
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(na > 0.0, round6p(ca / na)).as("rate_a"),
      when(nb > 0.0, round6p(cb / nb)).as("rate_b"),
      round6p(z).as("z_score"),
      (abs(round6p(z)) > 1.96).as("significant"))
  }

  /** Linear (equal-credit) multi-touch attribution: each conversion's
    * value is split evenly across the user's matching touch events in
    * the preceding `windowHours`; conversions with no touch credit a
    * `-1` ("direct") bucket in full. Output: per touch-key row counts
    * and exactly-summed credited value (credits are rounded to 6
    * decimals and summed as DECIMAL(18,6), so the total is
    * order-independent and engine-replayable).
    *
    * The touch⋈conversion join keys on `user_id` (co-partitioned on a
    * user-bucketed lake) with a time-range refinement, so its cost is
    * per-user touches × conversions inside the window — clickstream
    * users are small, and the per-conversion credit window is
    * O(touches-in-window) state.
    */
  def linearAttribution(events: DataFrame, touchPred: Column,
      convPred: Column, touchKey: Column,
      windowHours: Int = 24): DataFrame = {
    val winUs = windowHours * 3600L * 1000000L
    val conv = events.filter(convPred).select(
      col("user_id").as("_cu"), col("event_id").as("_cid"),
      unix_micros(col("ts")).as("_cts"), col("value").as("_cval"))
    val touch = events.filter(touchPred).select(
      col("user_id").as("_tu"), unix_micros(col("ts")).as("_tts"),
      touchKey.as("_tkey"))
    val joined = conv.join(touch,
      col("_cu") === col("_tu") && col("_tts") < col("_cts") &&
        col("_tts") >= col("_cts") - lit(winUs), "left")
    val perConv = Window.partitionBy(col("_cid"))
    joined
      .withColumn("_n", count(col("_tu")).over(perConv))
      .withColumn("touch_key", coalesce(col("_tkey"), lit(-1L)))
      .withColumn("_credit",
        round6p(when(col("_n") === 0, col("_cval").cast("double"))
          .otherwise(col("_cval").cast("double") / col("_n").cast("double")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .groupBy("touch_key")
      .agg(count(lit(1)).as("n_credits"),
        sum(col("_credit")).cast("double").as("credited"))
  }

  /** Stage-to-stage conversion lag: for each adjacent funnel step, the
    * completer count and the p50/p90/max seconds between the user's
    * stage completions. Percentiles are DISCRETE (an actual observed
    * lag, no interpolation arithmetic), and lags are exact micros
    * divided once by 1e6 — both engine-replayable. Each step is one
    * aggregate over the (already user-collapsed) stage-times frame.
    */
  def funnelTiming(events: DataFrame, stages: Seq[Column],
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(stages.size >= 2, "timing needs at least two stages")
    val times = funnelStageTimes(events, stages, userCol, tsCol)
      .localCheckpoint(true) // feeds one aggregate per step
    (1 until stages.size).map { i =>
      times.filter(col(s"t${i + 1}").isNotNull)
        .select(((unix_micros(col(s"t${i + 1}")) - unix_micros(col(s"t$i")))
          .cast("double") / lit(1e6)).as("_lag"))
        .agg(count(lit(1)).as("n_users"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _lag)").as("p50_s"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY _lag)").as("p90_s"),
          max(col("_lag")).as("max_s"))
        .select(lit(i).as("step_idx"), lit(s"$i->${i + 1}").as("step"),
          col("n_users"), col("p50_s"), col("p90_s"), col("max_s"))
    }.reduce(_ union _).orderBy("step_idx") // numeric: 10+ stages stay in funnel order
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
