package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Count–Min sketch invariants behind the q_cms_topk / q_cms_union
  * verdict gates.
  */
class SketchesSpec extends SparkTestBase {

  private def events = Tables.events(spark, sf001)

  test("CMS never undercounts: est_ge_exact holds for EVERY key, not just top-10") {
    val distinctUsers = events.select("user_id").distinct().count().toInt
    val all = Sketches.heavyHitters(events, "user_id", k = distinctUsers)
    assert(all.count() == distinctUsers)
    assert(all.filter(!col("est_ge_exact")).count() == 0)
  }

  test("CMS overcount stays within eps*N for the top keys at sf0.001 and sf0.01") {
    for (d <- Seq(sf0001, sf001)) {
      val hh = Sketches.heavyHitters(Tables.events(spark, d), "user_id", k = 25)
      assert(hh.filter(!col("est_within_bound")).count() == 0, s"bound exceeded at $d")
    }
  }

  test("per-day sketches union to the bit-identical single-pass sketch") {
    val one = Sketches.singleSketch(events, "user_id", 5e-4, 0.999, 42)
    val merged = Sketches.mergedSketch(
      events, "user_id", dayofmonth(col("ts")), 5e-4, 0.999, 42)
    assert(java.util.Arrays.equals(one, merged),
      "counter-wise union differs from single-pass sketch")
  }

  test("merged and single-pass verdict frames are identical") {
    val a = Sketches.heavyHitters(events, "user_id", k = 10).collect().toSeq
    val b = Sketches.heavyHittersMerged(
      events, "user_id", dayofmonth(col("ts")), k = 10).collect().toSeq
    assert(a == b)
  }
}
