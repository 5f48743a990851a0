package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plan proofs for the "user-bucketed lake" claim SCALE.md makes for
  * every user-keyed operator: once events are written bucketed on
  * `user_id`, the aggregate / window / co-bucketed join shapes all
  * compile WITHOUT any Exchange — the shuffle is paid once at write
  * time and never again.
  */
class BucketingSpec extends SparkTestBase {

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  private def exchanges(p: String): Int =
    p.linesIterator.count(_.contains("Exchange"))

  test("bucketed lake: user-keyed agg, window, and co-bucketed join plan zero exchanges") {
    val events = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    Layout.writeBucketed(events, "ev_bucketed", "user_id", 8,
      sortCols = Seq("user_id", "ts"))
    try {
      val t = spark.table("ev_bucketed")

      // per-user aggregate: bucketed scan already satisfies the
      // distribution — no shuffle before the final aggregate
      val agg = t.groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(exchanges(explain(agg)) == 0, explain(agg))

      // sessionize-style window on user_id: sort yes, shuffle no
      val w = Window.partitionBy("user_id").orderBy("ts")
      val win = t.withColumn("rn", row_number().over(w))
      assert(exchanges(explain(win)) == 0, explain(win))

      // self-join on the bucket key (forced SMJ so the small side
      // can't broadcast its way around the claim): still no exchange
      val l = t.select(col("user_id"), col("event_id").as("l_id"))
      val r = t.select(col("user_id"), col("event_id").as("r_id"))
      val j = l.hint("merge").join(r.hint("merge"), "user_id")
      val jp = explain(j)
      assert(jp.contains("SortMergeJoin"), jp)
      assert(exchanges(jp) == 0, jp)

      // and the data is intact
      assert(t.count() == events.count())
    } finally spark.sql("DROP TABLE IF EXISTS ev_bucketed")
  }
}
