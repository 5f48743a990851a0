package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computed invariants for the user-journey operators (the
  * per-row ground truth is the DuckDB oracle; these pin semantics on a
  * corpus small enough to reason about by hand).
  */
class JourneySpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: view→click→purchase (full funnel, strictly ordered)
  // user 2: click before view, no purchase → stalls at stage 1
  // user 3: view only
  // user 4: view→purchase (skips click) → purchase must NOT count
  private lazy val handEvents = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0L),
    (2L, 1L, ts("2024-01-01 10:05:00"), "click", 1L),
    (3L, 1L, ts("2024-01-01 10:10:00"), "purchase", 2L),
    (4L, 2L, ts("2024-01-01 09:00:00"), "click", 0L),
    (5L, 2L, ts("2024-01-01 11:00:00"), "view", 1L),
    (6L, 3L, ts("2024-01-01 12:00:00"), "view", 0L),
    (7L, 4L, ts("2024-01-01 13:00:00"), "view", 0L),
    (8L, 4L, ts("2024-01-01 13:30:00"), "purchase", 1L)
  ).toDF("event_id", "user_id", "ts", "event_type", "page")

  test("funnel is strictly ordered: later stages need an earlier-stage prefix") {
    val row = Journey.funnel(handEvents, Seq(
      col("event_type") === "view",
      col("event_type") === "click",
      col("event_type") === "purchase")).collect()(0)
    assert(row.getAs[Long]("n_stage1") == 4) // users 1,2,3,4 viewed
    assert(row.getAs[Long]("n_stage2") == 1) // only user 1 clicked AFTER viewing
    assert(row.getAs[Long]("n_stage3") == 1) // only user 1 purchased after that
    assert(row.getAs[Double]("conv_1_2") == 0.25)
  }

  test("funnel stage frame shrinks monotonically on real data") {
    val row = Journey.funnel(Tables.events(spark, sf0001), Seq(
      col("event_type") === "view",
      col("event_type") === "click",
      col("event_type") === "purchase")).collect()(0)
    val (n1, n2, n3) = (row.getAs[Long]("n_stage1"),
      row.getAs[Long]("n_stage2"), row.getAs[Long]("n_stage3"))
    assert(n1 >= n2 && n2 >= n3 && n1 > 0)
  }

  test("retention cohorts: offsets start at 0 and cohort sizes match week-0 counts") {
    val r = Journey.retentionCohorts(Tables.events(spark, sf0001))
    // every user's first-seen week is by construction an active week →
    // week_offset 0 exists for every cohort, and its n_users is the
    // cohort's total distinct users (everyone is active in week 0).
    assert(r.filter(col("week_offset") < 0).count() == 0)
    val week0 = r.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("w0"))
    val cohortSizes = Tables.events(spark, sf0001)
      .groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
      .groupBy("cohort_week").agg(countDistinct("user_id").as("total"))
    val bad = week0.join(cohortSizes, "cohort_week")
      .filter(col("w0") =!= col("total")).count()
    assert(bad == 0)
  }

  test("bounce rate: bounces ≤ sessions and session totals reconcile") {
    val events = Tables.events(spark, sf0001)
    val page = get_json_object(col("props"), "$.k").cast("bigint")
    val br = Journey.bounceRate(events, page)
    assert(br.filter(col("n_bounces") > col("n_sessions")).count() == 0)
    val totalSessions = br.agg(sum("n_sessions")).collect()(0).getLong(0)
    assert(totalSessions == Sessionize.sessions(events).count())
  }

  test("session paths: trigram counts on a hand corpus") {
    // one user, one session: view,click,purchase,view → exactly two trigrams
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "purchase"),
      (4L, 1L, ts("2024-01-01 10:03:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val paths = Journey.sessionPaths(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths == Map("view>click>purchase" -> 1L, "click>purchase>view" -> 1L))
  }

  test("session patterns: CEP shapes match hand-built sessions exactly") {
    // u1 s1: view,cart,purchase  -> browse_then_buy, NOT cart_abandoned
    // u1 s2 (>30m later): cart   -> cart_abandoned
    // u2 s1: purchase,purchase   -> repeat_buyer + instant_purchase
    // u3 s1: view,list           -> window_shopper
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "cart"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "purchase"),
      (4L, 1L, ts("2024-01-01 12:00:00"), "cart"),
      (5L, 2L, ts("2024-01-01 10:00:00"), "purchase"),
      (6L, 2L, ts("2024-01-01 10:05:00"), "purchase"),
      (7L, 3L, ts("2024-01-01 10:00:00"), "view"),
      (8L, 3L, ts("2024-01-01 10:01:00"), "list")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Journey.sessionPatterns(ev, Seq(
      "browse_then_buy" -> "v.*c.*p",
      "cart_abandoned" -> "c[^p]*$",
      "instant_purchase" -> "^[ivlk]{0,2}p",
      "window_shopper" -> "^[vlki]+$",
      "repeat_buyer" -> "p.*p")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("browse_then_buy", 1L, 1L),
      ("cart_abandoned", 1L, 1L),
      ("instant_purchase", 1L, 1L),
      ("repeat_buyer", 1L, 1L),
      ("window_shopper", 1L, 1L)))
  }

  test("ab test: zero pooled variance yields z = 0, not a divide error") {
    // users 1 (arm A) and 3 (arm B) both convert → p = 1 → variance 0 →
    // defined fallback instead of an ANSI divide error
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase"),
      (2L, 3L, ts("2024-01-01 11:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val row = Journey.abTest(ev, col("event_type") === "purchase").collect()(0)
    assert(row.getAs[Double]("z_score") == 0.0)
    assert(!row.getAs[Boolean]("significant"))
  }

  test("ab test: arms partition users and z tracks the rate difference") {
    val events = Tables.events(spark, sf0001)
    val row = Journey.abTest(events,
      col("event_type") === "purchase" && col("value") > 200).collect()(0)
    val users = events.select("user_id").distinct().count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == users)
    assert(row.getAs[Long]("conv_a") <= row.getAs[Long]("n_a"))
    assert(row.getAs[Long]("conv_b") <= row.getAs[Long]("n_b"))
    val z = row.getAs[Double]("z_score")
    val diff = row.getAs[Double]("rate_a") - row.getAs[Double]("rate_b")
    assert(z * diff >= 0, s"z=$z must have the sign of rate_a-rate_b=$diff")
  }

  test("linear attribution: equal split, direct bucket, value conservation") {
    // user 1: touches on pages 10,20 then a 12.00 purchase → 6.00 each
    // user 2: purchase 5.00 with no touches → direct (-1)
    // user 3: touch 2 days before the purchase → outside 24h → direct
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0, 10L),
      (2L, 1L, ts("2024-01-01 09:30:00"), "click", 0.0, 20L),
      (3L, 1L, ts("2024-01-01 10:00:00"), "purchase", 12.0, 30L),
      (4L, 2L, ts("2024-01-01 11:00:00"), "purchase", 5.0, 40L),
      (5L, 3L, ts("2024-01-01 01:00:00"), "view", 0.0, 50L),
      (6L, 3L, ts("2024-01-03 02:00:00"), "purchase", 8.0, 60L)
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "page")
    val out = Journey.linearAttribution(ev,
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", col("page"), windowHours = 24)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(10L) == ((1L, 6.0)) && out(20L) == ((1L, 6.0)))
    assert(out(-1L) == ((2L, 13.0)))
    assert(math.abs(out.values.map(_._2).sum - 25.0) < 1e-9)
  }

  test("markov attribution: removal effects match the hand-solved chain") {
    // journeys: u1 = A→conv, u2 = B→drop, u3 = A→B→conv  (A=0, B=1)
    // chain: S→A 2/3, S→B 1/3; A→C 1/2, A→B 1/2; B→C 1/2, B→∅ 1/2
    // p_full = 2/3; remove A → 1/6 (RE 1/2); remove B → 1/3 (RE 1/3)
    // shares over RE-sum 5/6: A 0.6, B 0.4; n_conv = 2 → 1.2 / 0.8
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0L),
      (2L, 1L, ts("2024-01-01 10:05:00"), "purchase", 99L),
      (3L, 2L, ts("2024-01-01 11:00:00"), "view", 1L),
      (4L, 3L, ts("2024-01-01 12:00:00"), "view", 0L),
      (5L, 3L, ts("2024-01-01 12:05:00"), "click", 1L),
      (6L, 3L, ts("2024-01-01 12:10:00"), "purchase", 99L)
    ).toDF("event_id", "user_id", "ts", "event_type", "page")
    val out = Markov.removalAttribution(ev,
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", col("page"), iters = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (pA, reA, shA, atA) = out(0L)
    val (pB, reB, shB, atB) = out(1L)
    assert(math.abs(pA - 1.0 / 6) < 1e-9 && math.abs(reA - 0.5) < 1e-9)
    assert(math.abs(pB - 1.0 / 3) < 1e-9 && math.abs(reB - 1.0 / 3) < 1e-9)
    assert(math.abs(shA - 0.6) < 1e-9 && math.abs(atA - 1.2) < 1e-9)
    assert(math.abs(shB - 0.4) < 1e-9 && math.abs(atB - 0.8) < 1e-9)
  }

  test("markov attribution: removal never increases conversion probability") {
    val events = Tables.events(spark, sf0001)
    val page = get_json_object(col("props"), "$.k").cast("bigint")
    val rows = Markov.removalAttribution(events,
      col("event_type").isin("view", "click"),
      col("event_type") === "purchase",
      pmod(page, lit(16L)), iters = 6).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    val pFull = rows.map(r => r.getDouble(1) + r.getDouble(2)).max
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= pFull + 1e-9,
        s"removing channel ${r.getLong(0)} raised conversion probability")
      assert(r.getDouble(2) >= -1e-9)
    }
    if (!rows.exists(r => r.isNullAt(3)))
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("markov attribution: the vocabulary guard rejects an oversized grid") {
    val events = Tables.events(spark, sf0001)
    val page = get_json_object(col("props"), "$.k").cast("bigint")
    val e = intercept[IllegalArgumentException] {
      Markov.removalAttribution(events,
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", page, iters = 2, maxChannels = 8)
    }
    assert(e.getMessage.contains("maxChannels"))
  }

  test("rolling active users: trailing windows and stickiness by hand") {
    // day1: u1,u2 · day2: u1 · day9: u3 (outside day2's 7-day window,
    // inside its own; day9's WAU window [day3..day9] holds only u3)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 2L, ts("2024-01-01 11:00:00"), "view"),
      (3L, 1L, ts("2024-01-02 10:00:00"), "view"),
      (4L, 3L, ts("2024-01-09 10:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val rows = Engagement.rollingActive(ev).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows("2024-01-01") == ((2L, 2L, 2L, 1.0)))
    assert(rows("2024-01-02") == ((1L, 2L, 2L, 0.5)))
    assert(rows("2024-01-09") == ((1L, 1L, 3L, 1.0))) // mau still sees u1,u2
  }

  test("activity histogram conserves users and events") {
    val events = Tables.events(spark, sf0001)
    val rows = Engagement.activityHistogram(events, bucketWidth = 10).collect()
    assert(rows.map(_.getLong(1)).sum ==
      events.select("user_id").distinct().count())
    assert(rows.map(_.getLong(2)).sum == events.count())
    assert(rows.forall(r => r.getLong(0) % 10 == 0))
  }

  test("funnel timing: discrete lags on the hand funnel") {
    // only user 1 completes both steps: view→click 5min, click→purchase 5min
    val rows = Journey.funnelTiming(handEvents, Seq(
      col("event_type") === "view",
      col("event_type") === "click",
      col("event_type") === "purchase")).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("1->2", "2->3"))
    assert(rows.forall(_.getLong(2) == 1L))
    assert(rows.forall(r => r.getDouble(3) == 300.0 && r.getDouble(5) == 300.0))
  }

  test("new vs returning: first-ever day is new, later days return") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 2L, ts("2024-01-01 11:00:00"), "view"),
      (3L, 1L, ts("2024-01-02 10:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val rows = Engagement.newVsReturning(ev).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("2024-01-01") == ((2L, 2L, 0L)))
    assert(rows("2024-01-02") == ((1L, 0L, 1L)))
  }

  test("cohort ltv: revenue conserves and cumulative curve is monotone") {
    val events = Tables.events(spark, sf0001)
    val rows = Engagement.cohortLtv(events).collect()
    val total = rows.map(_.getDouble(3)).sum
    val exact = events.agg(
      sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double")).collect()(0).getDouble(0)
    assert(math.abs(total - exact) < 1e-6, s"$total != $exact")
    rows.groupBy(_.getString(0)).foreach { case (_, cr) =>
      val sorted = cr.sortBy(_.getInt(1))
      val cums = sorted.map(_.getDouble(4))
      assert(cums.zip(cums.drop(1)).forall { case (a, b) => b >= a })
      assert(math.abs(cums.last - sorted.map(_.getDouble(3)).sum) < 1e-6)
    }
  }

  test("page transitions: probabilities sum to 1 per source page") {
    val events = Tables.events(spark, sf0001)
    val page = get_json_object(col("props"), "$.k").cast("bigint")
    val t = Journey.pageTransitions(events, page)
    val bad = t.groupBy("page").agg(sum("prob").as("p"))
      .filter(abs(col("p") - 1.0) > 0.001).count()
    assert(bad == 0)
    // edge counts reconcile with non-terminal event count per session
    val nEdges = t.agg(sum("cnt")).collect()(0).getLong(0)
    val sess = Sessionize.sessions(events)
    val expected = sess.agg(sum(col("n_events") - 1)).collect()(0).getLong(0)
    assert(nEdges == expected)
  }
}
