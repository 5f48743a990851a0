package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Checkpoints, Engagement, Graph, Journey, Markov}
import Qutil._

/** User-journey analytics gates: ordered funnel, weekly cohort retention,
  * per-entry-page bounce rate, session page-transition probabilities, and
  * PageRank over the click graph — the classic web-analytics repertoire
  * on top of the reference's sessionized event model
  * (`web-analytics-parquet/cdk_stacks/athena_workgroup.py:46-47`).
  *
  * Determinism follows FIXTURES.md §4; PageRank additionally rounds every
  * per-edge contribution to 12 decimals and sums in DECIMAL(18,12) so the
  * DuckDB oracle replays all five power iterations byte-for-byte (see
  * `operators/Graph.scala`).
  */
object JourneyQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private def pageCol = get_json_object(col("props"), "$.k").cast("bigint")

  /** Shared oracle prefix: sessionized events with the page key, plus the
    * within-session click-graph edges `(src, dst, w)`.
    */
  private val edgesCte =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS BIGINT) AS page,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, event_id, page,
      |         sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM g),
      |nx AS (
      |  SELECT user_id, session_seq, page,
      |         lead(page) OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS next_page
      |  FROM s),
      |e AS MATERIALIZED (SELECT page AS src, next_page AS dst, count(*) AS w
      |      FROM nx WHERE next_page IS NOT NULL GROUP BY 1, 2)""".stripMargin

  /** The 5 unrolled PageRank iterations as DuckDB CTEs (matching
    * `Graph.pageRank(iters = 5, damping = 0.85)` bit-for-bit: IEEE-double
    * terms rounded to 12 decimals via the portable `round(x·10¹²)/10¹²`
    * form — see `Graph.round12` for why a plain `round(x, 12)` diverges
    * by one ulp between engines — then summed as DECIMAL(18,12), with
    * uniform dangling redistribution).
    */
  private def pagerankOracle(iters: Int): String = {
    def r12(x: String) = s"round(($x) * 1e12, 0) / 1e12"
    val iterCtes = (1 to iters).map { i =>
      val p = s"p${i - 1}"
      val term = r12("CAST(p.pr AS DOUBLE) * CAST(e.w AS DOUBLE) / o.out_w")
      val rank = r12("(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)" +
        s" + CAST(0.85 AS DOUBLE) * (coalesce(c.contrib, CAST(0 AS DOUBLE))" +
        s" + (SELECT dang FROM d$i) / (SELECT n FROM nn))")
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |         CAST(sum(CAST($term AS DECIMAL(18,12))) AS DOUBLE) AS contrib
         |  FROM e JOIN $p p ON e.src = p.node JOIN ow o ON e.src = o.src GROUP BY 1),
         |d$i AS (
         |  SELECT coalesce(CAST(sum(p.pr) AS DOUBLE), CAST(0 AS DOUBLE)) AS dang
         |  FROM $p p LEFT JOIN ow o ON p.node = o.src WHERE o.src IS NULL),
         |p$i AS MATERIALIZED (
         |  SELECT n.node, CAST($rank AS DECIMAL(18,12)) AS pr
         |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    val init = r12("CAST(1.0 AS DOUBLE) / (SELECT n FROM nn)")
    s"""$edgesCte,
       |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |ow AS (SELECT src, CAST(sum(w) AS DOUBLE) AS out_w FROM e GROUP BY 1),
       |p0 AS (SELECT node, CAST($init AS DECIMAL(18,12)) AS pr FROM nodes),
       |$iterCtes
       |SELECT node, CAST(pr AS DOUBLE) AS pr FROM p$iters ORDER BY node""".stripMargin
      .replace("\n", " ")
  }

  /** Personalized-PageRank oracle: the same unrolled-iteration recipe as
    * `pagerankOracle`, with teleport and dangling mass going to the
    * normalized purchase-page restart vector instead of uniform.
    */
  private def pprOracle(iters: Int): String = {
    def r12(x: String) = s"round(($x) * 1e12, 0) / 1e12"
    val iterCtes = (1 to iters).map { i =>
      val p = s"pp${i - 1}"
      val term = r12("CAST(p.pr AS DOUBLE) * CAST(e.w AS DOUBLE) / o.out_w")
      val rank = r12("(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(rr.r AS DOUBLE)" +
        s" + CAST(0.85 AS DOUBLE) * (coalesce(c.contrib, CAST(0 AS DOUBLE))" +
        s" + (SELECT dang FROM dd$i) * CAST(rr.r AS DOUBLE))")
      s"""cc$i AS (
         |  SELECT e.dst AS node,
         |         CAST(sum(CAST($term AS DECIMAL(18,12))) AS DOUBLE) AS contrib
         |  FROM e JOIN $p p ON e.src = p.node JOIN ow o ON e.src = o.src GROUP BY 1),
         |dd$i AS (
         |  SELECT coalesce(CAST(sum(p.pr) AS DOUBLE), CAST(0 AS DOUBLE)) AS dang
         |  FROM $p p LEFT JOIN ow o ON p.node = o.src WHERE o.src IS NULL),
         |pp$i AS MATERIALIZED (
         |  SELECT rr.node, CAST($rank AS DECIMAL(18,12)) AS pr
         |  FROM rr LEFT JOIN cc$i c ON rr.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""$edgesCte,
       |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |ow AS (SELECT src, CAST(sum(w) AS DOUBLE) AS out_w FROM e GROUP BY 1),
       |rw AS (SELECT CAST(props->>'$$.k' AS BIGINT) AS rn,
       |              CAST(count(*) AS BIGINT) AS w
       |       FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |rj AS MATERIALIZED (SELECT n.node, CAST(coalesce(rw.w, 0) AS BIGINT) AS w
       |      FROM nodes n LEFT JOIN rw ON n.node = rw.rn),
       |rr AS MATERIALIZED (SELECT node,
       |       CAST(${r12("CAST(w AS DOUBLE) / (SELECT CAST(sum(w) AS DOUBLE) FROM rj)")} AS DECIMAL(18,12)) AS r
       |      FROM rj),
       |pp0 AS (SELECT node, r AS pr FROM rr),
       |$iterCtes
       |SELECT node, CAST(pr AS DOUBLE) AS pr FROM pp$iters ORDER BY node""".stripMargin
      .replace("\n", " ")
  }

  /** The `iters` unrolled Markov-attribution chain steps as DuckDB CTEs,
    * matching `Markov.removalAttribution(iters, channel = page % 16)`
    * bit-for-bit (same IEEE-double term order, same
    * `round(x·10¹²)/10¹²` grid, same DECIMAL(18,12) sums).
    *
    * Iteration CTEs are `MATERIALIZED`: DuckDB 1.0 inlines CTEs at each
    * reference, and every step references its predecessor twice (moves +
    * carry), so an unhinted chain re-evaluates the whole journey subtree
    * 2^iters times (observed: >300 s at sf0.01 vs 0.7 s hinted).
    */
  private def markovOracle(iters: Int): String = {
    def r12(x: String) = s"round(($x) * 1e12, 0) / 1e12"
    val iterCtes = (1 to iters).map { i =>
      val p = s"mv${i - 1}"
      val term = r12("CAST(p.mass AS DOUBLE) * ev.cnt / ev.out_w")
      s"""mv$i AS MATERIALIZED (
         |  SELECT removed, state,
         |         CAST(${r12("CAST(sum(term) AS DOUBLE)")} AS DECIMAL(18,12)) AS mass
         |  FROM (
         |    SELECT ev.removed, ev.dst AS state,
         |           CAST($term AS DECIMAL(18,12)) AS term
         |    FROM ev JOIN $p p ON p.removed = ev.removed AND p.state = ev.src
         |    WHERE ev.dst <> -3
         |    UNION ALL
         |    SELECT removed, state, mass AS term FROM $p WHERE state = -2)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH cv AS (
       |  SELECT user_id AS cu, min(epoch_us(ts)) AS cts
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |tc AS MATERIALIZED (
       |  SELECT e.user_id AS u, epoch_us(e.ts) AS tts, e.event_id AS eid,
       |         CAST(props->>'$$.k' AS BIGINT) % 16 AS ch,
       |         cv.cts IS NOT NULL AS converted
       |  FROM events e LEFT JOIN cv ON e.user_id = cv.cu
       |  WHERE e.event_type IN ('view', 'click')
       |    AND (cv.cts IS NULL OR epoch_us(e.ts) < cv.cts)),
       |sq AS (
       |  SELECT u, ch, lead(ch) OVER w AS nxt, row_number() OVER w AS rn, converted
       |  FROM tc WINDOW w AS (PARTITION BY u ORDER BY tts, eid)),
       |ed0 AS (
       |  SELECT ch AS src,
       |         coalesce(nxt, CASE WHEN converted THEN -2 ELSE -3 END) AS dst
       |  FROM sq
       |  UNION ALL SELECT -1, ch FROM sq WHERE rn = 1
       |  UNION ALL SELECT -1, -2 FROM cv
       |            WHERE cu NOT IN (SELECT DISTINCT u FROM tc)),
       |e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt
       |      FROM ed0 GROUP BY 1, 2),
       |ow AS (SELECT src, CAST(sum(cnt) AS DOUBLE) AS out_w FROM e GROUP BY 1),
       |chans AS (SELECT src AS ch FROM e WHERE src >= 0
       |          UNION SELECT dst FROM e WHERE dst >= 0),
       |vars AS (SELECT ch AS removed FROM chans
       |         UNION ALL SELECT CAST(-4 AS BIGINT)),
       |ev AS MATERIALIZED (SELECT v.removed, e.src, e.dst, e.cnt, ow.out_w
       |       FROM vars v CROSS JOIN e JOIN ow ON e.src = ow.src
       |       WHERE e.src <> v.removed AND e.dst <> v.removed),
       |mv0 AS (SELECT removed, CAST(-1 AS BIGINT) AS state,
       |               CAST(1.0 AS DECIMAL(18,12)) AS mass FROM vars),
       |$iterCtes,
       |pc AS (SELECT removed, CAST(mass AS DOUBLE) AS p
       |       FROM mv$iters WHERE state = -2),
       |pf AS (SELECT coalesce((SELECT p FROM pc WHERE removed = -4),
       |                       CAST(0 AS DOUBLE)) AS p_full),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_conv FROM cv),
       |re AS (
       |  SELECT c.ch AS channel,
       |         coalesce(pc.p, CAST(0 AS DOUBLE)) AS p_without,
       |         ${r12("pf.p_full - coalesce(pc.p, CAST(0 AS DOUBLE))")}
       |           AS removal_effect
       |  FROM chans c LEFT JOIN pc ON c.ch = pc.removed CROSS JOIN pf),
       |tot AS (SELECT CAST(sum(CAST(removal_effect AS DECIMAL(18,12)))
       |                    AS DOUBLE) AS total FROM re)
       |SELECT channel, p_without, removal_effect,
       |       CASE WHEN tot.total > 0 THEN
       |         round(removal_effect / tot.total * 1e6, 0) / 1e6 END AS share,
       |       CASE WHEN tot.total > 0 THEN
       |         round((round(removal_effect / tot.total * 1e6, 0) / 1e6)
       |           * CAST(nc.n_conv AS DOUBLE) * 1e6, 0) / 1e6
       |       END AS attributed_conversions
       |FROM re CROSS JOIN tot CROSS JOIN nc ORDER BY channel""".stripMargin
      .replace("\n", " ")
  }

  val all: Seq[Q] = Seq(

    // ordered first-touch funnel: view → click → purchase. Stage i+1 must
    // strictly follow the user's earliest stage-i completion.
    Q("q_funnel",
      (s, d) => Journey.funnel(ev(s, d), Seq(
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase")),
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (
             |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
             |t3 AS (
             |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
             |SELECT (SELECT count(*) FROM t1) AS n_stage1,
             |       (SELECT count(*) FROM t2) AS n_stage2,
             |       (SELECT count(*) FROM t3) AS n_stage3,
             |       round(CAST((SELECT count(*) FROM t2) AS DOUBLE)
             |         / CAST((SELECT count(*) FROM t1) AS DOUBLE), 6) AS conv_1_2,
             |       round(CAST((SELECT count(*) FROM t3) AS DOUBLE)
             |         / CAST((SELECT count(*) FROM t2) AS DOUBLE), 6) AS conv_2_3""".stripMargin
        .replace("\n", " ")),
      headline = true),

    // stage-to-stage conversion lag percentiles (discrete, replayable).
    Q("q_funnel_timing",
      (s, d) => Journey.funnelTiming(ev(s, d), Seq(
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase")),
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (
             |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
             |t3 AS (
             |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1),
             |l12 AS (SELECT CAST(epoch_us(t2.t2) - epoch_us(t1.t1) AS DOUBLE) / 1e6 AS lag
             |        FROM t2 JOIN t1 ON t2.user_id = t1.user_id),
             |l23 AS (SELECT CAST(epoch_us(t3.t3) - epoch_us(t2.t2) AS DOUBLE) / 1e6 AS lag
             |        FROM t3 JOIN t2 ON t3.user_id = t2.user_id)
             |SELECT 1 AS step_idx, '1->2' AS step, CAST(count(*) AS BIGINT) AS n_users,
             |       quantile_disc(lag, 0.5) AS p50_s, quantile_disc(lag, 0.9) AS p90_s,
             |       max(lag) AS max_s FROM l12
             |UNION ALL
             |SELECT 2, '2->3', CAST(count(*) AS BIGINT),
             |       quantile_disc(lag, 0.5), quantile_disc(lag, 0.9), max(lag) FROM l23
             |ORDER BY step_idx""".stripMargin.replace("\n", " "))),

    // weekly cohort retention triangle (cohort = Monday week of first event).
    Q("q_retention_cohorts",
      (s, d) => Journey.retentionCohorts(ev(s, d))
        .select(
          date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy("cohort_week", "week_offset"),
      Some("""WITH fs AS (
             |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |  FROM events GROUP BY 1),
             |aw AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
             |  FROM events)
             |SELECT strftime(fs.cohort_week, '%Y-%m-%d') AS cohort_week,
             |       CAST(date_diff('day', fs.cohort_week, aw.active_week) // 7 AS INT) AS week_offset,
             |       count(DISTINCT aw.user_id) AS n_users
             |FROM aw JOIN fs ON aw.user_id = fs.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // per-entry-page bounce rate (bounce = single-event session).
    Q("q_bounce_rate",
      (s, d) => Journey.bounceRate(ev(s, d), pageCol).orderBy("entry_page"),
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS BIGINT) AS page,
             |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts, event_id, page,
             |         sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM g),
             |r AS (
             |  SELECT user_id, session_seq, page,
             |         row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS rn
             |  FROM s),
             |sess AS (
             |  SELECT user_id, session_seq,
             |         max(CASE WHEN rn = 1 THEN page END) AS entry_page,
             |         count(*) AS n_events
             |  FROM r GROUP BY 1, 2)
             |SELECT entry_page, count(*) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
             |       round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |         / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
             |FROM sess GROUP BY 1 ORDER BY entry_page""".stripMargin.replace("\n", " "))),

    // session click-graph transition probabilities.
    Q("q_page_transitions",
      (s, d) => Journey.pageTransitions(ev(s, d), pageCol)
        .orderBy("page", "next_page"),
      Some(s"""$edgesCte
              |SELECT src AS page, dst AS next_page, w AS cnt,
              |       round(CAST(w AS DOUBLE)
              |         / CAST(sum(w) OVER (PARTITION BY src) AS DOUBLE), 6) AS prob
              |FROM e ORDER BY page, next_page""".stripMargin.replace("\n", " "))),

    // top within-session event-type trigram paths ("what users do next").
    Q("q_session_paths",
      (s, d) => Journey.sessionPaths(ev(s, d), len = 3, k = 20),
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM g),
             |p AS (
             |  SELECT event_type AS s0,
             |         lead(event_type, 1) OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS s1,
             |         lead(event_type, 2) OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS s2
             |  FROM s)
             |SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS cnt
             |FROM p WHERE s1 IS NOT NULL AND s2 IS NOT NULL
             |GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20""".stripMargin.replace("\n", " ")),
      headline = true),

    // CEP-style sequence-pattern matching over sessions (Trino
    // MATCH_RECOGNIZE / Flink CEP re-expressed Spark-first): sessions
    // collapse to ordered event-letter strings, behavioral shapes are
    // regexes over them — browse-then-buy, cart abandonment, instant
    // purchase, window shopping, repeat buying. The oracle rebuilds the
    // same strings with string_agg and matches the same regexes.
    Q("q_session_patterns",
      (s, d) => Journey.sessionPatterns(ev(s, d), Seq(
        "browse_then_buy" -> "v.*c.*p",
        "cart_abandoned" -> "c[^p]*$",
        "instant_purchase" -> "^[ivlk]{0,2}p",
        "window_shopper" -> "^[vlki]+$",
        "repeat_buyer" -> "p.*p")),
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |         CASE event_type WHEN 'visit' THEN 'i' WHEN 'view' THEN 'v'
             |              WHEN 'list' THEN 'l' WHEN 'like' THEN 'k'
             |              WHEN 'cart' THEN 'c' WHEN 'purchase' THEN 'p'
             |              ELSE 'x' END AS letter,
             |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts, event_id, letter,
             |         sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM g),
             |strs AS (
             |  SELECT user_id, session_seq, string_agg(letter, '' ORDER BY ts, event_id) AS sq
             |  FROM s GROUP BY 1, 2),
             |p(pattern, re) AS (VALUES
             |  ('browse_then_buy', 'v.*c.*p'),
             |  ('cart_abandoned', 'c[^p]*$'),
             |  ('instant_purchase', '^[ivlk]{0,2}p'),
             |  ('window_shopper', '^[vlki]+$'),
             |  ('repeat_buyer', 'p.*p'))
             |SELECT pattern, count(*) AS n_sessions,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM strs JOIN p ON regexp_matches(sq, re)
             |GROUP BY 1 ORDER BY pattern""".stripMargin.replace("\n", " ")),
      headline = true),

    // deterministic A/B readout: md5-parity arms, pooled two-proportion z.
    // Conversion = any high-value purchase (~21% of users at every SF, so
    // the variance term is live and the z-test is real).
    Q("q_ab_test",
      (s, d) => Journey.abTest(ev(s, d),
        col("event_type") === "purchase" && col("value") > 200),
      Some("""WITH u AS (
             |  SELECT user_id,
             |         max(CASE WHEN event_type = 'purchase' AND value > 200 THEN 1 ELSE 0 END) AS conv,
             |         list_reduce(list_transform(range(1, 16),
             |           i -> strpos('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
             |           (a, b) -> a * 16 + b) % 2 AS par
             |  FROM events GROUP BY user_id),
             |a AS (
             |  SELECT CAST(count(CASE WHEN par = 0 THEN 1 END) AS BIGINT) AS n_a,
             |         CAST(count(CASE WHEN par = 1 THEN 1 END) AS BIGINT) AS n_b,
             |         CAST(sum(CASE WHEN par = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
             |         CAST(sum(CASE WHEN par = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
             |  FROM u),
             |z AS (
             |  SELECT n_a, n_b, conv_a, conv_b,
             |         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
             |         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2,
             |         CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p
             |  FROM a),
             |zz AS (
             |  SELECT n_a, n_b, conv_a, conv_b, p1, p2,
             |         CASE WHEN n_a > 0 AND n_b > 0
             |                   AND p * (CAST(1.0 AS DOUBLE) - p) > 0 THEN
             |           round((p1 - p2) / sqrt(p * (CAST(1.0 AS DOUBLE) - p)
             |             * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
             |               + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))) * 1e6, 0) / 1e6
             |         ELSE CAST(0 AS DOUBLE) END AS z
             |  FROM z)
             |SELECT n_a, n_b, conv_a, conv_b,
             |       round(p1 * 1e6, 0) / 1e6 AS rate_a,
             |       round(p2 * 1e6, 0) / 1e6 AS rate_b,
             |       z AS z_score, abs(z) > 1.96 AS significant
             |FROM zz""".stripMargin.replace("\n", " ")),
      headline = true),

    // linear multi-touch attribution: purchase value split evenly over the
    // user's view/click touches in the trailing 24 h (page -1 = direct).
    Q("q_linear_attribution",
      (s, d) => Journey.linearAttribution(ev(s, d),
          col("event_type").isin("view", "click"),
          col("event_type") === "purchase",
          pageCol, windowHours = 24)
        .orderBy("touch_key"),
      Some("""WITH p AS (
             |  SELECT event_id AS pid, user_id, epoch_us(ts) AS pts, value
             |  FROM events WHERE event_type = 'purchase'),
             |t AS (
             |  SELECT user_id, epoch_us(ts) AS tts, CAST(props->>'$.k' AS BIGINT) AS page
             |  FROM events WHERE event_type IN ('view', 'click')),
             |j AS (
             |  SELECT p.pid, p.value, t.user_id AS tu, t.page
             |  FROM p LEFT JOIN t ON p.user_id = t.user_id
             |    AND t.tts < p.pts AND t.tts >= p.pts - 86400000000),
             |c AS (
             |  SELECT pid, value, coalesce(page, -1) AS touch_key,
             |         count(tu) OVER (PARTITION BY pid) AS n
             |  FROM j),
             |cr AS (
             |  SELECT touch_key,
             |         CAST(round((CASE WHEN n = 0 THEN CAST(value AS DOUBLE)
             |           ELSE CAST(value AS DOUBLE) / CAST(n AS DOUBLE) END) * 1e6, 0) / 1e6
             |           AS DECIMAL(18,6)) AS credit
             |  FROM c)
             |SELECT touch_key, CAST(count(*) AS BIGINT) AS n_credits,
             |       CAST(sum(credit) AS DOUBLE) AS credited
             |FROM cr GROUP BY 1 ORDER BY touch_key""".stripMargin.replace("\n", " ")),
      headline = true),

    // Markov removal-effect attribution: first-order chain over 16
    // channels (page % 16), 6 chain steps, all removal variants iterated
    // as one grid. The oracle replays journeys, transition counts, and
    // every iteration byte-for-byte.
    Q("q_markov_attribution",
      (s, d) => Markov.removalAttribution(ev(s, d),
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase",
        pmod(pageCol, lit(16L)), iters = 6),
      Some(markovOracle(6)),
      headline = true),

    // rolling DAU/WAU/MAU with stickiness: distinct (user, day) collapse,
    // then contribution-explode into trailing windows — never a
    // window over raw events.
    Q("q_rolling_active",
      (s, d) => Engagement.rollingActive(ev(s, d)),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
             |dy AS (SELECT d AS day, CAST(count(DISTINCT u) AS BIGINT) AS dau
             |       FROM ud GROUP BY 1),
             |w7 AS (SELECT dy.day, CAST(count(DISTINCT ud.u) AS BIGINT) AS wau
             |       FROM dy JOIN ud ON ud.d BETWEEN dy.day - 6 AND dy.day GROUP BY 1),
             |w28 AS (SELECT dy.day, CAST(count(DISTINCT ud.u) AS BIGINT) AS mau
             |        FROM dy JOIN ud ON ud.d BETWEEN dy.day - 27 AND dy.day GROUP BY 1)
             |SELECT dy.day AS day, dau, wau, mau,
             |       round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) * 1e6, 0) / 1e6 AS stickiness_w,
             |       round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) * 1e6, 0) / 1e6 AS stickiness_m
             |FROM dy JOIN w7 ON dy.day = w7.day JOIN w28 ON dy.day = w28.day
             |ORDER BY dy.day""".stripMargin.replace("\n", " ")),
      headline = true),

    // new-vs-returning split per activity day.
    Q("q_new_vs_returning",
      (s, d) => Engagement.newVsReturning(ev(s, d)),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
             |f AS (SELECT u, min(d) AS fd FROM ud GROUP BY 1)
             |SELECT ud.d AS day, CAST(count(*) AS BIGINT) AS dau,
             |       CAST(count(CASE WHEN ud.d = f.fd THEN 1 END) AS BIGINT) AS new_users,
             |       CAST(count(*) - count(CASE WHEN ud.d = f.fd THEN 1 END) AS BIGINT) AS returning
             |FROM ud JOIN f ON ud.u = f.u
             |GROUP BY 1 ORDER BY day""".stripMargin.replace("\n", " "))),

    // cohort lifetime-value curve: weekly cohorts, exact DECIMAL(18,2)
    // revenue, running cumulative LTV per cohort user.
    Q("q_cohort_ltv",
      (s, d) => Engagement.cohortLtv(ev(s, d)),
      Some("""WITH f AS (
             |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
             |  FROM events GROUP BY 1),
             |sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1),
             |r AS (
             |  SELECT f.cw,
             |         CAST(date_diff('day', f.cw, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT) AS wo,
             |         sum(CAST(e.value AS DECIMAL(18,2))) AS rev
             |  FROM events e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2),
             |c AS (SELECT cw, wo, rev,
             |             sum(rev) OVER (PARTITION BY cw ORDER BY wo) AS cum
             |      FROM r)
             |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week, c.wo AS week_offset,
             |       sz.cohort_size,
             |       CAST(rev AS DOUBLE) AS revenue,
             |       CAST(cum AS DOUBLE) AS cum_revenue,
             |       round(CAST(cum AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE) * 1e6, 0) / 1e6 AS ltv_per_user
             |FROM c JOIN sz ON c.cw = sz.cw
             |ORDER BY cohort_week, week_offset""".stripMargin.replace("\n", " ")),
      headline = true),

    // power-user curve: users bucketed by lifetime event count.
    Q("q_activity_histogram",
      (s, d) => Engagement.activityHistogram(ev(s, d), bucketWidth = 10),
      Some("""WITH n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |          FROM events GROUP BY 1)
             |SELECT CAST(floor(n / 10) * 10 AS BIGINT) AS bucket_lo,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(n) AS BIGINT) AS n_events
             |FROM n GROUP BY 1 ORDER BY bucket_lo""".stripMargin.replace("\n", " "))),

    // PageRank over the click graph: 5 power iterations, damping 0.85,
    // dangling mass redistributed uniformly.
    Q("q_pagerank",
      (s, d) => Graph.pageRank(
        Journey.transitionEdges(ev(s, d), pageCol)
          .select(col("page").as("src"), col("next_page").as("dst"),
            col("cnt").as("weight")),
        iters = 5, damping = 0.85)
        .orderBy("node"),
      Some(pagerankOracle(5)),
      headline = true),

    // multi-source BFS reach: minimum click-distance from the decade
    // pages (node % 10 = 0) over the session transition graph, 4 hops —
    // "how many clicks from a landing page is everything else". The
    // oracle replays the frontier search as a recursive CTE with UNION
    // dedup (bounded by nodes × hops, never path-combinatorial).
    Q("q_bfs_reach",
      (s, d) => {
        // one event-scale pass: the sessionize+window edge derivation is
        // cut HERE so the node-set union (2 scans) and the BFS edge prep
        // read the materialized edge list instead of re-running it (r15)
        val edges = Journey.transitionEdges(ev(s, d), pageCol)
          .select(col("page").as("src"), col("next_page").as("dst"))
          .transform(Checkpoints.cut)
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        Graph.bfsDistances(edges, nodes.filter(col("node") % 10 === 0),
          maxHops = 4)
          .orderBy("node")
      },
      Some(edgesCte.replace("WITH g AS (", "WITH RECURSIVE g AS (") +
        """,
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |srcs AS (SELECT node FROM nodes WHERE node % 10 = 0),
          |walk AS (
          |  SELECT node, 0 AS dist FROM srcs
          |  UNION
          |  SELECT e.dst AS node, w.dist + 1 AS dist
          |  FROM walk w JOIN e ON e.src = w.node WHERE w.dist < 4)
          |SELECT node, CAST(min(dist) AS INT) AS dist
          |FROM walk GROUP BY 1 ORDER BY node""".stripMargin.replace("\n", " ")),
      headline = true),

    // personalized PageRank: teleport to the purchase-page restart
    // vector — "which pages matter from where conversions happen".
    Q("q_ppr_conversion",
      (s, d) => {
        val e = ev(s, d)
        Graph.personalizedPageRank(
          Journey.transitionEdges(e, pageCol)
            .select(col("page").as("src"), col("next_page").as("dst"),
              col("cnt").as("weight")),
          e.filter(col("event_type") === "purchase")
            .groupBy(pageCol.as("node")).agg(count(lit(1)).as("w")),
          iters = 5, damping = 0.85)
          .orderBy("node")
      },
      Some(pprOracle(5)))
  )
}
