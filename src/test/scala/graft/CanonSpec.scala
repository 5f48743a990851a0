package graft

import org.apache.spark.sql.functions._

/** Smoke + invariants for the query canon (SURVEY.md §2.4). The strong
  * per-row check is the driver's DuckDB oracle (scripts/check_oracle.py
  * pre-flights it); these specs assert structural invariants cheaply.
  */
class CanonSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every canon query runs at sf0.001 and is non-degenerate") {
    val allowedEmpty = Set.empty[String]
    SparkEntry.canon.foreach { q =>
      val n = q.run(spark, sf0001).count()
      assert(n > 0 || allowedEmpty(q.name), s"${q.name} returned 0 rows")
    }
  }

  test("oracle names all exist in queries") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k)))
  }

  test("counts are consistent across canon queries") {
    val d = sf0001
    val total = SparkEntry.queries("q_count_total")(spark, d)
      .collect()(0).getLong(0)
    val byType = SparkEntry.queries("q_count_by_type")(spark, d)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val hourly = SparkEntry.queries("q_events_hourly")(spark, d)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == byType && total == hourly)
  }

  test("sessionize partitions events exactly") {
    val d = sf0001
    val events = Tables.events(spark, d).count()
    val sess = operators.Sessionize.sessions(Tables.events(spark, d))
    assert(sess.agg(sum("n_events")).collect()(0).getLong(0) == events)
    // session ordinals are dense per user, starting at 1
    val bad = sess.groupBy("user_id")
      .agg(max("session_seq").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
  }
}
