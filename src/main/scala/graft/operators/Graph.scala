package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-analysis over a weighted directed graph, DataFrame-first (no
  * GraphX): PageRank by power iteration, with each iteration one
  * edges⋈ranks join + one hash aggregate on the destination key — the
  * textbook distributed formulation. Connected components live in
  * [[Dedup.clusters]]; this file covers ranked importance (e.g. the
  * click-graph of page→next-page transitions a web-analytics lake
  * derives from sessionized events).
  *
  * Scale notes: ranks are one row per node (node_id, decimal) — always a
  * tiny fraction of the edge set; the per-iteration join shuffles edges
  * on `src` once and contributions on `dst` once, both key-only rows
  * (ids + one decimal). Lineage is cut per iteration with an eager
  * [[Checkpoints.cut]] so the plan stays O(1) per iteration instead of
  * growing exponentially (the standard iterative-DataFrame hazard);
  * set `spark.graft.checkpoint.reliable=true` with a configured
  * checkpoint dir for the executor-loss-safe reliable variant on a
  * real cluster. The dangling mass joins in as a
  * broadcast 1-row aggregate; the node count is the single O(1) driver
  * scalar, read once up front.
  *
  * Cross-engine determinism (FIXTURES.md §4): per-edge contributions are
  * computed in IEEE double (bit-identical in any engine), rounded to 12
  * decimals, summed as DECIMAL(18,12) (exact, order-independent), and the
  * new rank is re-rounded to 12 decimals — so a SQL oracle replaying the
  * same iteration count reproduces every rank byte-for-byte.
  */
object Graph {

  private val Dec = DecimalType(18, 12)

  /** Ulp-portable 12-decimal grid — see [[PortableRound]] for why a
    * plain `round(x, 12)` diverges between engines.
    */
  private def round12(c: Column): Column = PortableRound.r12(c)

  /** The static per-graph frames both rank operators iterate over:
    * checkpointed node set (with a per-node dangling flag), and edges
    * pre-joined with their source's total out-weight.
    */
  private case class GraphFrames(nodes: DataFrame, eOut: DataFrame)

  private def prep(edges: DataFrame): GraphFrames = {
    // cut the INPUT once: `edges` is usually an event-scale derivation
    // (e.g. [[Journey.transitionEdges]] — sessionize + window + agg) and
    // every frame below consumes it — uncut, the nodes union re-ran it
    // twice and outW/eOut once each (4 full passes measured in r15; one
    // pass + three scans of the materialized edge list after the cut).
    val e = edges.select(
      col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"),
      col("weight").cast("long").as("weight"))
      .transform(Checkpoints.cut)
    val outW = e.groupBy("src").agg(sum("weight").as("out_w"))
    // edges pre-joined with their source's total out-weight: static across
    // iterations, checkpoint once.
    val eOut = e.join(outW, "src").transform(Checkpoints.cut)
    // dangling = no out-edge; carried as a FLAG on the node set so each
    // iteration reads it off the ranks frame instead of re-joining a
    // separate dangling list (one join per iteration saved, r15)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(outW.select(col("src").as("_ow")), col("node") === col("_ow"),
        "left")
      .select(col("node"), col("_ow").isNull.as("_dang"))
      .transform(Checkpoints.cut)
    GraphFrames(nodes, eOut)
  }

  /** Per-destination in-mass: exact decimal sum of IEEE-double per-edge
    * terms → order-independent. Shared by both rank operators (and
    * mirrored term-for-term by both oracles).
    */
  private def contributions(eOut: DataFrame, ranks: DataFrame): DataFrame =
    eOut
      .join(ranks, eOut("src") === ranks("node"))
      .select(col("dst"),
        round12(col("pr").cast("double") * col("weight").cast("double") /
          col("out_w").cast("double")).cast(Dec).as("term"))
      .groupBy("dst").agg(sum(col("term")).as("contrib"))

  /** Multi-source BFS over a directed edge list `(src, dst)`: the
    * minimum hop distance from ANY source node, explored up to
    * `maxHops`. Frontier iteration, each hop ONE frontier⋈edges join
    * plus an anti-join against the visited set — every exchanged row is
    * (id) or (id, int), never wider; lineage is cut per hop like the
    * rank loops. Integer-only, so cross-engine determinism is free.
    * Returns (node, dist) for sources (0) and every node reached
    * within `maxHops`; unreached nodes emit no row. Termination is
    * `maxHops` or an empty frontier, whichever first — the empty check
    * is a limit-1 probe per hop, not a count.
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .transform(Checkpoints.cut)
    val origin = edges.sparkSession
    val dist0 = sources.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0))
      .transform(Checkpoints.cut)
    // hop frames (frontier, visited set) are bounded by the node set,
    // itself bounded by the checkpointed edge list — size the loop on it
    val loopRows = e.count()
    Checkpoints.withIterationPlanning(origin, loopRows) { loop =>
    val eL = Checkpoints.rebind(e, loop)
    var dist = Checkpoints.rebind(dist0, loop)
    var frontier = dist.select("node")
    var hop = 0
    var exhausted = frontier.isEmpty
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = frontier.join(eL, frontier("node") === eL("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .transform(Checkpoints.cut)
      if (next.isEmpty) exhausted = true
      else {
        // no re-cut: `dist` stays a UNION of already-checkpointed hop
        // frames — scanning it is exchange-free and the union depth is
        // bounded by maxHops, so re-materializing the accumulated set
        // every hop (one extra job per hop) bought nothing (r15)
        dist = dist.unionByName(next.withColumn("dist", lit(hop)))
        frontier = next
      }
    }
    Checkpoints.rebind(dist, origin)
    }
  }

  /** PageRank over weighted edges `(src: long, dst: long, weight: long)`.
    * Returns `(node, pr)` with `pr` a 12-decimal double. Dangling mass
    * (nodes with no out-edges) is redistributed uniformly each iteration,
    * so total rank stays ~1 and results match the canonical formulation.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val g = prep(edges)
    val n = g.nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")

    val origin = edges.sparkSession
    val base = (1.0 - damping) / n
    val ranks0 = g.nodes
      .withColumn("pr", round12(lit(1.0) / lit(n.toDouble)).cast(Dec))
      .transform(Checkpoints.cut)

    // loop frames are bounded by the checkpointed setup: ranks carry one
    // row per node, contributions one per edge — size the loop from them
    val loopRows = math.max(n, g.eOut.count())
    val ranks = Checkpoints.withIterationPlanning(origin, loopRows) { loop =>
    val eOutL = Checkpoints.rebind(g.eOut, loop)
    val nodesL = Checkpoints.rebind(g.nodes, loop)
    var r = Checkpoints.rebind(ranks0, loop)
    for (_ <- 1 to iters) {
      val contrib = contributions(eOutL, r)
      // dangling mass rides along as a broadcast 1-row aggregate — no
      // per-iteration driver action; the checkpoint below is the only
      // one. The dangling filter is the `_dang` flag carried on the
      // ranks frame itself (stamped once in prep), not a join.
      val dangOverN = r.filter(col("_dang"))
        .agg((coalesce(sum(col("pr")), lit(0).cast(Dec)).cast("double") /
          lit(n.toDouble)).as("_dang_over_n"))
      r = nodesL
        .join(contrib, nodesL("node") === contrib("dst"), "left")
        .crossJoin(broadcast(dangOverN))
        .select(col("node"), col("_dang"),
          round12(lit(base) + lit(damping) *
            (coalesce(col("contrib").cast("double"), lit(0.0)) +
              col("_dang_over_n"))).cast(Dec).as("pr"))
        .transform(Checkpoints.cut)
    }
    Checkpoints.rebind(r, origin)
    }
    ranks.select(col("node"), col("pr").cast("double").as("pr"))
  }

  /** Personalized PageRank: teleport (and dangling mass) goes to a
    * restart distribution instead of uniform — "importance as seen
    * from these nodes" (e.g. rank pages by relevance to where
    * conversions happen). `restart` is `(node, w ≥ 0)` integral
    * weights; rows for nodes outside the graph are ignored and graph
    * nodes absent from `restart` get weight 0. Ranks start AT the
    * normalized restart vector and iterate
    * `r·(1−d) + d·(contrib + dang·r)`.
    *
    * Same scale shape as [[pageRank]] (one edges⋈ranks shuffle + one
    * dst aggregate per iteration, per-iteration lineage cut); same
    * determinism recipe (IEEE terms on the 12-decimal grid,
    * DECIMAL(18,12) sums), so a SQL oracle replays it exactly. The
    * driver scalar here is the restart mass total (O(1)).
    */
  def personalizedPageRank(edges: DataFrame, restart: DataFrame,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val g = prep(edges)
    val rw = restart
      .select(col("node").cast("long").as("_rn"), col("w").cast("long").as("_w"))
      .groupBy("_rn").agg(sum("_w").as("_w"))
    val rOnGraph = g.nodes.join(rw, g.nodes("node") === col("_rn"), "left")
      .select(col("node"), col("_dang"), coalesce(col("_w"), lit(0L)).as("_w"))
      .transform(Checkpoints.cut)
    // coalesce: an empty graph aggregates to NULL, which must surface as
    // the require message below, not a NullPointerException
    val totalW = rOnGraph.agg(coalesce(sum(col("_w")), lit(0L)))
      .collect()(0).getLong(0)
    require(totalW > 0, "restart mass must touch at least one graph node")
    val rFrame = rOnGraph
      .select(col("node"), col("_dang"),
        round12(col("_w").cast("double") / lit(totalW.toDouble))
          .cast(Dec).as("r"))
      .transform(Checkpoints.cut)

    val origin = edges.sparkSession
    val loopRows = math.max(rFrame.count(), g.eOut.count())
    val ranks = Checkpoints.withIterationPlanning(origin, loopRows) { loop =>
    val eOutL = Checkpoints.rebind(g.eOut, loop)
    val rFrameL = Checkpoints.rebind(rFrame, loop)
    // the initial ranks ARE the restart vector — read rFrame directly
    // (the former copy-then-cut re-materialized an identical frame)
    var r = rFrameL.select(col("node"), col("_dang"), col("r").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = contributions(eOutL, r)
      // dangling mass via the `_dang` flag on the ranks frame (see
      // [[pageRank]]) — no per-iteration join against a dangling list
      val dang = r.filter(col("_dang"))
        .agg(coalesce(sum(col("pr")), lit(0).cast(Dec)).cast("double")
          .as("_dang_mass"))
      r = rFrameL
        .join(contrib, rFrameL("node") === contrib("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(rFrameL("node"), rFrameL("_dang"),
          round12(lit(1.0 - damping) * col("r").cast("double") +
            lit(damping) *
              (coalesce(col("contrib").cast("double"), lit(0.0)) +
                col("_dang_mass") * col("r").cast("double"))).cast(Dec).as("pr"))
        .transform(Checkpoints.cut)
    }
    Checkpoints.rebind(r, origin)
    }
    ranks.select(col("node"), col("pr").cast("double").as("pr"))
  }
}
