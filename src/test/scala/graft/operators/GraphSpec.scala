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
