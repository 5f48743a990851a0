package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** PageRank ground truth on hand graphs plus conservation invariants on
  * the real click graph (byte-level cross-engine equality is the DuckDB
  * oracle's job; these pin the algorithm).
  */
class GraphSpec extends SparkTestBase {

  import spark.implicits._

  private def prMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("symmetric cycle stays uniform") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "weight")
    val pr = prMap(Graph.pageRank(edges, iters = 5))
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
  }

  test("dangling node: hand-computed two-iteration values") {
    // 1 → 2; node 2 dangles. pr0 = (.5, .5)
    // iter1: pr1 = .075 + .85*(0 + .25) = .2875
    //        pr2 = .075 + .85*(.5 + .25) = .7125
    // iter2: dang = .7125/2 = .35625
    //        pr1 = .075 + .85*.35625            = .3778125
    //        pr2 = .075 + .85*(.2875 + .35625)  = .6221875
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "weight")
    val pr = prMap(Graph.pageRank(edges, iters = 2))
    assert(math.abs(pr(1L) - 0.3778125) < 1e-12)
    assert(math.abs(pr(2L) - 0.6221875) < 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("edge weights steer rank") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "weight")
    val pr = prMap(Graph.pageRank(edges, iters = 5))
    assert(pr(2L) > pr(3L))
  }

  test("personalized pagerank with uniform restart matches plain pagerank") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "weight") // node 4 dangles
    val restart = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("node", "w")
    val pr = prMap(Graph.pageRank(edges, iters = 5))
    val ppr = prMap(Graph.personalizedPageRank(edges, restart, iters = 5))
    pr.foreach { case (n, v) => assert(math.abs(ppr(n) - v) < 1e-9, s"node $n") }
  }

  test("personalized pagerank: hand-computed two-iteration values on a cycle") {
    // 1→2→3→1, all teleport mass on node 1; init = restart = (1, 0, 0)
    // iter1: p1 = .15·1 + .85·p3₀ = .15 ; p2 = .85·p1₀ = .85 ; p3 = 0
    // iter2: p1 = .15 + .85·0 = .15 ; p2 = .85·.15 = .1275 ; p3 = .85·.85 = .7225
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "weight")
    val restart = Seq((1L, 1L)).toDF("node", "w")
    val ppr = prMap(Graph.personalizedPageRank(edges, restart, iters = 2))
    assert(math.abs(ppr(1L) - 0.15) < 1e-12)
    assert(math.abs(ppr(2L) - 0.1275) < 1e-12)
    assert(math.abs(ppr(3L) - 0.7225) < 1e-12)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9) // teleport conserves mass
  }

  test("personalized pagerank rejects restart mass outside the graph") {
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "weight")
    val restart = Seq((99L, 5L)).toDF("node", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, restart, iters = 2)
    }
    assert(e.getMessage.contains("restart mass"))
  }

  test("bfs distances: hand graph, min over multiple paths, hop cap, empty frontier") {
    //  1 → 2 → 3 → 4 → 5, plus shortcut 1 → 3 and a cycle 4 → 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    def run(src: Seq[Long], hops: Int): Map[Long, Int] =
      Graph.bfsDistances(edges, src.toDF("node"), hops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // from node 1: the shortcut wins over the longer path to 3
    assert(run(Seq(1L), 4) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
    // the hop cap truncates the search
    assert(run(Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    assert(run(Seq(1L), 0) == Map(1L -> 0))
    // multi-source: every node takes its NEAREST source
    assert(run(Seq(1L, 4L), 4) ==
      Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1, 5L -> 1))
    // a sink source exhausts the frontier before the cap (node 5 has no
    // out-edges) — terminates early, emits just itself
    assert(run(Seq(5L), 10) == Map(5L -> 0))
    // cycles never revisit: 4 → 1 → 2 → 3 → (4 already visited)
    assert(run(Seq(4L), 10) ==
      Map(4L -> 0, 5L -> 1, 1L -> 1, 2L -> 2, 3L -> 2))
  }

  test("total rank is conserved on the real click graph") {
    val events = Tables.events(spark, sf0001)
    val page = get_json_object(col("props"), "$.k").cast("bigint")
    val edges = Journey.transitionEdges(events, page)
      .select(col("page").as("src"), col("next_page").as("dst"),
        col("cnt").as("weight"))
    val pr = Graph.pageRank(edges, iters = 5)
    val total = pr.agg(sum("pr")).collect()(0).getDouble(0)
    // rounding each rank to 12 decimals bounds drift at n_nodes * 5e-13
    assert(math.abs(total - 1.0) < 1e-6)
    assert(pr.filter(col("pr") <= 0).count() == 0)
  }
}
