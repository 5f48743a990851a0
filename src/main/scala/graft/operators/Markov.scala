package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Markov-chain (removal-effect) multi-touch attribution — the standard
  * data-driven alternative to rule-based credit splitting
  * ([[Journey.linearAttribution]]): model each user's pre-conversion
  * touch sequence as a first-order Markov chain over channel states plus
  * START / CONVERSION / NULL absorbing states, then credit each channel
  * by how much the chain's conversion probability drops when that
  * channel is removed (Anderl et al.'s removal effect). This is the
  * kind of "any SQL over the web-log tables" analysis the reference's
  * Athena workgroup exists to serve
  * (`web-analytics-parquet/cdk_stacks/athena_workgroup.py:46-47`),
  * promoted to a first-class distributed operator.
  *
  * Scale notes: the heavy work — journey construction and transition
  * counting — is one window pass over touches keyed on `user_id` (the
  * reference's Kinesis shard key, so co-located on a user-bucketed
  * lake) followed by an aggregate keyed on the channel vocabulary. The
  * chain itself is vocabulary-sized: all removal variants iterate
  * together as one `(removed, state)`-keyed DataFrame — a single
  * distributed job per iteration over at most
  * `(channels+1) × edges` rows, never a per-channel re-run. The only
  * driver scalars are the vocabulary guard and the converted-user
  * count (both O(1)); lineage is cut per iteration with an eager
  * [[Checkpoints.cut]] exactly like [[Graph.pageRank]] (same
  * `spark.graft.checkpoint.reliable` knob for cluster runs).
  *
  * Cross-engine determinism (FIXTURES.md §4, the [[Graph]] recipe):
  * per-edge terms are computed in IEEE double, rounded to 12 decimals
  * (`round(x·10¹²)/10¹²`), summed as DECIMAL(18,12) (exact,
  * order-independent), and re-rounded — so a SQL oracle replaying the
  * same iteration count reproduces every probability byte-for-byte.
  * Conversion probabilities are the `iters`-step truncation of the
  * absorbing-chain limit (documented, replayable), not an
  * until-convergence loop.
  */
object Markov {

  private val Dec = DecimalType(18, 12)

  /** Sentinel states; user channels must be non-negative longs. */
  val Start = -1L
  val Conversion = -2L
  val Dropout = -3L
  /** The unmodified-chain variant key in the removal grid. */
  val NoRemoval = -4L

  private def round12(c: Column): Column = PortableRound.r12(c)
  private def round6p(c: Column): Column = PortableRound.r6(c)

  /** Removal-effect attribution over `events`. A user's journey is the
    * ordered sequence of `touchPred` events strictly before their first
    * `convPred` event (all touches if they never convert), each mapped
    * to `channelCol` (non-negative long, small vocabulary —
    * `maxChannels` guards the grid). Journeys compile to transition
    * counts START→ch₁→…→chₙ→{CONVERSION | NULL}; converting users with
    * no prior touch contribute START→CONVERSION directly.
    *
    * Output, one row per channel, ordered by `channel`:
    *   - `p_without`: `iters`-step conversion probability of the chain
    *     with this channel removed (transitions through it become lost
    *     mass);
    *   - `removal_effect`: `p_full − p_without`;
    *   - `share`: this channel's fraction of the summed removal
    *     effects (null when the total is 0);
    *   - `attributed_conversions`: `share ×` converted-user count.
    */
  def removalAttribution(events: DataFrame, touchPred: Column,
      convPred: Column, channelCol: Column, iters: Int = 6,
      maxChannels: Int = 256): DataFrame = {
    require(iters >= 1, "need at least one chain step")
    val spark = events.sparkSession

    // ONE event-scale pass (r16; guide §2.4 — the former conv/touches
    // pair each ran its own full scan of `events`): rows matching either
    // predicate are materialized once, narrow, with the two roles as
    // flags; `conv` and `touches` both derive from the cut. Equivalence
    // is a filter identity: evs.filter(_is_touch) ≡ events.filter(touchPred)
    // and evs.filter(_is_conv) ≡ events.filter(convPred), row for row.
    val evs = events.filter(touchPred || convPred)
      .select(col("user_id").as("_u"), unix_micros(col("ts")).as("_ts"),
        col("event_id").as("_eid"), channelCol.cast("long").as("_ch"),
        touchPred.as("_is_touch"), convPred.as("_is_conv"))
      .transform(Checkpoints.cut)

    // per-user first conversion instant (micros; ties can't matter for a min)
    val conv = evs.filter(col("_is_conv"))
      .groupBy(col("_u").as("_cu"))
      .agg(min(col("_ts")).as("_cts"))
      .transform(Checkpoints.cut)

    // pre-conversion touches, in deterministic order
    val touches = evs.filter(col("_is_touch"))
      .select(col("_u"), col("_ts"), col("_eid"), col("_ch"))
      .join(conv, col("_u") === col("_cu"), "left")
      .filter(col("_cts").isNull || col("_ts") < col("_cts"))
      .select(col("_u"), col("_ts"), col("_eid"), col("_ch"),
        col("_cts").isNotNull.as("_converted"))
      // checkpointed: the window pass, the anti-join, and the guard
      // aggregate all consume it
      .transform(Checkpoints.cut)

    val w = Window.partitionBy(col("_u")).orderBy(col("_ts"), col("_eid"))
    val seq = touches
      .withColumn("_nxt", lead(col("_ch"), 1).over(w))
      .withColumn("_rn", row_number().over(w))

    // ONE window pass (r15): each touch row emits its own transition
    // edge plus, on the first row of a journey, the START edge — the
    // former two-branch union re-ran the window sort per branch.
    val dstExpr = coalesce(col("_nxt"),
      when(col("_converted"), lit(Conversion)).otherwise(lit(Dropout)))
    val rowEdges = seq.select(explode(when(col("_rn") === 1,
        array(struct(col("_ch").as("src"), dstExpr.as("dst")),
          struct(lit(Start).as("src"), col("_ch").as("dst"))))
      .otherwise(
        array(struct(col("_ch").as("src"), dstExpr.as("dst"))))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
    // converting users with no pre-conversion touch: START → CONVERSION
    val directEdges = conv
      .join(touches.select(col("_u")).distinct(),
        col("_cu") === col("_u"), "left_anti")
      .select(lit(Start).as("src"), lit(Conversion).as("dst"))

    val edges = rowEdges.union(directEdges)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      .transform(Checkpoints.cut)
    val outW = edges.groupBy("src").agg(sum("cnt").as("out_w"))
    // eOut is consumed exactly once (the ev grid build below) — no cut
    val eOut = edges.join(outW, "src")

    val chans = edges.select(col("src").as("ch"))
      .union(edges.select(col("dst").as("ch")))
      .filter(col("ch") >= 0).distinct().transform(Checkpoints.cut)

    // O(1) driver guards: grid size and the channel/sentinel contract
    val guard = touches.agg(
      coalesce(min(col("_ch")), lit(0L)).as("lo"),
      countDistinct(col("_ch")).as("k"),
      count(when(col("_ch").isNull, 1)).as("nulls")).collect()(0)
    require(guard.getLong(2) == 0, "channelCol must not be null on touches")
    require(guard.getLong(0) >= 0, "channels must be non-negative longs")
    require(guard.getLong(1) <= maxChannels,
      s"${guard.getLong(1)} channels exceed maxChannels=$maxChannels " +
        "— coarsen channelCol (the removal grid is channels × edges)")

    // removal grid: the full chain plus one variant per removed channel;
    // a variant's edge set excises every edge touching the removed
    // state. Dropout-destination edges are excised here too (their mass
    // is discarded — the former loop re-filtered them every iteration),
    // while out_w keeps counting them, which is the removal-effect
    // semantics. A per-variant CONVERSION self-loop (cnt = out_w = 1,
    // so term = round12(mass·1/1) = mass — the 12-decimal grid
    // round-trips exactly through double) makes the absorbing-state
    // carry part of the ONE join instead of a second union branch
    // reading `v` (r15): with `v` referenced once per iteration the
    // plan grows LINEARLY across iterations, so the loop runs uncut as
    // a single action and lineage is cut once at the end — 6 chained
    // join+agg pairs in one job instead of 6 checkpoint jobs of ~5
    // AQE-materialization jobs each.
    val variants = chans.select(col("ch").as("removed"))
      .union(spark.range(1).select(lit(NoRemoval).as("removed")))
    val selfLoop = variants.select(col("removed"),
      lit(Conversion).as("src"), lit(Conversion).as("dst"),
      lit(1L).as("cnt"), lit(1L).as("out_w"))
    val ev = variants.crossJoin(eOut)
      .filter(col("src") =!= col("removed") && col("dst") =!= col("removed")
        && col("dst") =!= lit(Dropout))
      .unionByName(selfLoop)
      .transform(Checkpoints.cut)

    val v0 = variants.select(col("removed"), lit(Start).as("state"),
      lit(1.0).cast(Dec).as("mass"))
    // the loop frames are grid-sized by the maxChannels contract — size
    // the shuffles from the materialized grid (guide §2), don't pay the
    // session's event-scale fan-out per vocabulary-sized exchange
    val v = Checkpoints.withIterationPlanning(spark, ev.count()) { loop =>
      val evL = Checkpoints.rebind(ev, loop)
      var vL = Checkpoints.rebind(v0, loop)
      for (_ <- 1 to iters) {
        vL = evL.join(
          vL.select(col("removed").as("_vr"), col("state"), col("mass")),
          col("_vr") === col("removed") && col("state") === col("src"))
          .select(col("removed"), col("dst").as("state"),
            round12(col("mass").cast("double") * col("cnt").cast("double") /
              col("out_w").cast("double")).cast(Dec).as("term"))
          .groupBy(col("removed"), col("state"))
          .agg(round12(sum(col("term")).cast("double")).cast(Dec).as("mass"))
      }
      // ONE cut for the whole chain: downstream reads v twice (p_conv
      // and the removal-effect join), which would re-run all `iters`
      // rounds on an uncut plan
      Checkpoints.rebind(Checkpoints.cut(vL), spark)
    }

    val pConv = v.filter(col("state") === lit(Conversion))
      .select(col("removed"), col("mass").cast("double").as("_p"))
    val pFull = pConv.filter(col("removed") === lit(NoRemoval))
      .agg(coalesce(sum(col("_p")), lit(0.0)).as("_p_full"))
    val nConv = conv.agg(count(lit(1)).as("_n_conv"))

    val re = chans
      .join(pConv, col("ch") === col("removed"), "left")
      .crossJoin(broadcast(pFull))
      .crossJoin(broadcast(nConv))
      .select(col("ch").as("channel"),
        coalesce(col("_p"), lit(0.0)).as("p_without"),
        round12(col("_p_full") - coalesce(col("_p"), lit(0.0)))
          .as("removal_effect"),
        col("_n_conv"))
    val reTotal = Window.partitionBy()
    re.withColumn("_total",
        sum(col("removal_effect").cast(Dec)).over(reTotal).cast("double"))
      .select(col("channel"), col("p_without"), col("removal_effect"),
        when(col("_total") > 0.0,
          round6p(col("removal_effect") / col("_total"))).as("share"),
        when(col("_total") > 0.0,
          round6p(round6p(col("removal_effect") / col("_total")) *
            col("_n_conv").cast("double"))).as("attributed_conversions"))
      .orderBy("channel")
  }
}
