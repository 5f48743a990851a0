package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Joins operators: the as-of union+window formulation must equal the
  * naive range-join + argmax definition, and the bucketed range join
  * must equal the plain theta join — on real testdata, plus crafted
  * edge cases (ties, unmatched rows, boundary inclusivity).
  */
class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("asOfBackward equals naive latest-prior-row definition on events") {
    val e = graft.Tables.events(spark, sf0001)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_event_id"))

    val got = Joins.asOfBackward(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("view_event_id"))
      .select("event_id", "view_event_id")

    // naive: range join then keep max (ts, view_event_id) per purchase
    val naive = purchases.as("p")
      .join(views.as("v"),
        col("p.user_id") === col("v.user_id") && col("v.ts") <= col("p.ts"),
        "left_outer")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max_by(col("v.view_event_id"), struct(col("v.ts"), col("v.view_event_id")))
        .as("view_event_id"))

    assert(got.count() === purchases.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("asOfBackward: inclusive at equal time, max-payload tie-break, null when no match") {
    val left = Seq((1L, 100L, "l1"), (1L, 50L, "l2"), (2L, 10L, "l3"))
      .toDF("k", "t", "lname")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 60L, 5L), (2L, 11L, 3L))
      .toDF("k", "t", "rid")
    val got = Joins.asOfBackward(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select("lname", "rid").as[(String, Option[Long])].collect().toMap
    assert(got("l1") === Some(9L)) // equal-time inclusive, tie -> max rid
    assert(got("l2") === None)     // only future right rows
    assert(got("l3") === None)     // right row strictly after
  }

  test("rangeJoinBucketed equals theta join, inclusive bounds") {
    // sf0.01: at sf0.001 the value/acctbal ranges don't overlap (0 pairs)
    val pts = graft.Tables.events(spark, sf001).select("event_id", "value")
    val iv = graft.Tables.supplier(spark, sf001).select(col("s_suppkey"),
      col("s_acctbal").as("lo"), (col("s_acctbal") + 50).as("hi"))
    val got = Joins.rangeJoinBucketed(pts, "value", iv, "lo", "hi", 50.0)
      .select("event_id", "s_suppkey")
    val theta = pts.join(iv, col("value") >= col("lo") && col("value") <= col("hi"))
      .select("event_id", "s_suppkey")
    assert(got.count() > 0)
    assert(got.exceptAll(theta).isEmpty && theta.exceptAll(got).isEmpty)

    // exact boundary values land inside
    val p2 = Seq((1L, 10.0), (2L, 20.0), (3L, 20.000001)).toDF("id", "v")
    val i2 = Seq((100L, 10.0, 20.0)).toDF("iv", "lo", "hi")
    val hits = Joins.rangeJoinBucketed(p2, "v", i2, "lo", "hi", 7.0)
      .select("id").as[Long].collect().sorted
    assert(hits.toSeq === Seq(1L, 2L))
  }
}
