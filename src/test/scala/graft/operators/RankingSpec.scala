package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The distributed ranking must agree with the single-partition window
  * it replaces — on arbitrary data, including heavy ties (the case where
  * rank vs dense_rank vs row_number diverge) and both sort directions.
  */
class RankingSpec extends SparkTestBase {

  private def randomDf(seed: Long, n: Int, distinctKeys: Int) = {
    import spark.implicits._
    val r = new scala.util.Random(seed)
    // many ties: keys drawn from a small space
    (0 until n).map(i => (i.toLong, r.nextInt(distinctKeys).toLong))
      .toDF("id", "key")
      .repartition(7) // deliberately unaligned with the range shuffle
  }

  private def check(seed: Long, n: Int, distinctKeys: Int,
      ascending: Boolean, dense: Boolean): Unit = {
    val df = randomDf(seed, n, distinctKeys)
    val sortExpr = if (ascending) col("key").asc else col("key").desc
    val w = Window.orderBy(sortExpr)
    val expected = df
      .withColumn("want", (if (dense) dense_rank() else rank()).over(w))
      .select("id", "want")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranking.withGlobalRank(df, col("key"), ascending, "got", dense)
      .select("id", "got")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, g) =>
      assert(g == expected(id).toLong,
        s"id=$id: got $g, want ${expected(id)} (seed=$seed asc=$ascending dense=$dense)")
    }
  }

  test("rank matches the unpartitioned-window ground truth (ties, both directions)") {
    check(seed = 1, n = 500, distinctKeys = 20, ascending = true, dense = false)
    check(seed = 2, n = 500, distinctKeys = 20, ascending = false, dense = false)
    // near-unique keys
    check(seed = 3, n = 300, distinctKeys = 10000, ascending = false, dense = false)
  }

  test("dense_rank matches the unpartitioned-window ground truth") {
    check(seed = 4, n = 500, distinctKeys = 20, ascending = true, dense = true)
    check(seed = 5, n = 500, distinctKeys = 20, ascending = false, dense = true)
  }

  test("null keys rank like the window ground truth (nulls group together)") {
    import spark.implicits._
    val df = (Seq[(Long, Option[Long])]((0L, None), (1L, Some(5L)), (2L, None),
      (3L, Some(5L)), (4L, Some(9L)), (5L, Some(1L)), (6L, None)))
      .toDF("id", "key").repartition(5)
    for (asc <- Seq(true, false); dense <- Seq(true, false)) {
      val sortExpr = if (asc) col("key").asc else col("key").desc
      val expected = df
        .withColumn("want",
          (if (dense) dense_rank() else rank()).over(Window.orderBy(sortExpr)))
        .select("id", "want")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranking.withGlobalRank(df, col("key"), asc, "got", dense)
        .select("id", "got")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      expected.foreach { case (id, want) =>
        assert(got(id) == want.toLong, s"id=$id asc=$asc dense=$dense: got ${got(id)}, want $want")
      }
    }
  }

  test("degenerate inputs: empty frame and all-equal keys") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "key")
    assert(Ranking.withGlobalRank(empty, col("key"), ascending = true, "r").count() == 0)
    val same = (0L until 50L).map((_, 7L)).toDF("id", "key")
    val ranked = Ranking.withGlobalRank(same, col("key"), ascending = true, "r")
      .select("r").distinct().collect().map(_.getLong(0))
    assert(ranked.toSeq == Seq(1L), "all-equal keys must all rank 1")
  }
}
