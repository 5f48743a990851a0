package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental materialized aggregate: refreshes fold ONLY the source's
  * CDC window and must equal a full recompute after every refresh,
  * under inserts, updates, deletes, replays and zero-count groups.
  */
class MaterializedAggSpec extends SparkTestBase {

  private def keyedSource(): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory("mv_src").toString + "/t",
      "event", Seq("user_id", "ts"))

  private def viewTable(): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory("mv_tgt").toString + "/t",
      "view", Seq("user_id"))

  private def rows(n: Range, event: String, value: Long, seq: Long): DataFrame = {
    import spark.implicits._
    n.map(i => (s"u${i % 7}", f"2024-01-01T${i % 24}%02d:00:${i % 60}%02dZ-$i",
      event, value + i % 3, seq))
      .toDF("user_id", "ts", "event", "value", "seq")
  }

  private def assertMatches(mv: MaterializedAgg): Unit = {
    val got = mv.read.select("user_id", "cnt", "sum_value")
    val want = mv.fullRecompute
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"view ${got.collect().toSeq} != recompute ${want.collect().toSeq}")
  }

  test("refresh equals full recompute through inserts, updates and deletes") {
    val src = keyedSource()
    val mv = MaterializedAgg(src, viewTable(), Seq("user_id"), Seq("value"))
    assert(mv.refresh().isEmpty) // empty source: nothing to do

    src.write(rows(0 until 40, "view", 10L, 1L), "seq")
    val w1 = mv.refresh()
    assert(w1.isDefined && mv.refreshedThrough.contains(src.currentVersion.get))
    assertMatches(mv)

    // update: same keys, different values (pre/postimage pairs)
    src.write(rows(0 until 20, "view", 50L, 2L), "seq")
    // insert: new keys
    src.write(rows(100 until 120, "click", 5L, 3L), "seq")
    assert(mv.refresh().isDefined)
    assertMatches(mv)

    // delete a slice of rows
    src.delete(col("value") >= 50L)
    assert(mv.refresh().isDefined)
    assertMatches(mv)

    // no new source commits: refresh is a no-op
    assert(mv.refresh().isEmpty)
    assertMatches(mv)
  }

  test("zero-count groups are erased from the view") {
    val src = keyedSource()
    val mv = MaterializedAgg(src, viewTable(), Seq("user_id"), Seq("value"))
    import spark.implicits._
    val only = Seq(("lonely", "2024-01-01T00:00:00Z", "view", 3L, 1L))
      .toDF("user_id", "ts", "event", "value", "seq")
    src.write(rows(0 until 10, "view", 10L, 1L).unionByName(only), "seq")
    assert(mv.refresh().isDefined)
    assert(mv.read.filter(col("user_id") === "lonely").count() == 1)
    src.delete(col("user_id") === "lonely")
    assert(mv.refresh().isDefined)
    // the group vanished from the source, so it must vanish from the view
    assert(mv.read.filter(col("user_id") === "lonely").count() == 0)
    assertMatches(mv)
  }

  test("NULL group keys refresh correctly across commits") {
    import spark.implicits._
    val src = keyedSource()
    val mv = MaterializedAgg(src, viewTable(), Seq("user_id"), Seq("value"))
    def batch(rows: Seq[(Option[String], String, Long)], seq: Long) =
      rows.map { case (u, ts, v) => (u.orNull, ts, "view", v, seq) }
        .toDF("user_id", "ts", "event", "value", "seq")
    src.write(batch(Seq(
      (None, "t1", 5L), (None, "t2", 7L), (Some("u1"), "t1", 1L)), 1L), "seq")
    assert(mv.refresh().isDefined)
    assertMatches(mv)
    assert(mv.read.filter(col("user_id").isNull).select("cnt")
      .as[Long].head() == 2L)
    // a second refresh joins deltas against the EXISTING null-group row:
    // an equi-join would read its current count as 0 and clobber the
    // absolute value with the delta alone
    src.write(batch(Seq((None, "t3", 11L)), 2L), "seq")
    assert(mv.refresh().isDefined)
    assertMatches(mv)
    assert(mv.read.filter(col("user_id").isNull)
      .select("cnt", "sum_value").as[(Long, Long)].head() == ((3L, 23L)))
    // delete every null-key row: the null group must leave the view too
    src.delete(col("user_id").isNull)
    assert(mv.refresh().isDefined)
    assert(mv.read.filter(col("user_id").isNull).count() == 0)
    assertMatches(mv)
  }

  test("count-0 rows left by a crash between refresh and cleanup stay invisible") {
    import spark.implicits._
    val src = keyedSource()
    val tgt = viewTable()
    val mv = MaterializedAgg(src, tgt, Seq("user_id"), Seq("value"))
    src.write(rows(0 until 10, "view", 10L, 1L), "seq")
    assert(mv.refresh().isDefined)
    // simulate the crash window: the refresh upsert committed a
    // zero-count group row, the follow-up cleanup delete never ran (and
    // the replayed refresh is skipped by the high-water mark)
    // the zero row carries the crashed refresh's own cursor version in
    // _seq, exactly as refresh() would have written it
    val ghost = Seq(("ghost", 0L, 0L, "all", mv.refreshedThrough.get))
      .toDF("user_id", "cnt", "sum_value", "view", "_seq")
    tgt.upsert(ghost, "_seq")
    assert(mv.read.filter(col("user_id") === "ghost").count() == 0,
      "a zero-count row must never be user-visible")
    assertMatches(mv)
    // later activity on the group folds against the retained zero row
    src.write(Seq(("ghost", "2024-01-01T00:00:00Z", "view", 7L, 2L))
      .toDF("user_id", "ts", "event", "value", "seq"), "seq")
    assert(mv.refresh().isDefined)
    assert(mv.read.filter(col("user_id") === "ghost")
      .select("cnt", "sum_value").as[(Long, Long)].head() == ((1L, 7L)))
    assertMatches(mv)
  }

  test("multi-column groups refresh through the point-pruned read") {
    import spark.implicits._
    val src = keyedSource()
    val tgt = IcebergLikeTable(spark,
      Files.createTempDirectory("mv_tgt2").toString + "/t",
      "view", Seq("user_id", "event"),
      statsColumns = Seq("user_id", "event"))
    val mv = MaterializedAgg(src, tgt, Seq("user_id", "event"), Seq("value"))
    src.write(rows(0 until 40, "view", 10L, 1L), "seq")
    src.write(rows(0 until 40, "click", 20L, 1L), "seq")
    assert(mv.refresh().isDefined)
    def matches(): Unit = {
      val got = mv.read.select("user_id", "event", "cnt", "sum_value")
      val want = mv.fullRecompute
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"view ${got.collect().toSeq} != recompute ${want.collect().toSeq}")
    }
    matches()

    // a key-local update: the 2-column affected-group predicate must
    // ENGAGE (the r7 code disabled it for multi-column groups) so the
    // current-values join is a point read, and the refresh still folds
    // exactly
    src.write(rows(0 until 5, "view", 99L, 2L), "seq")
    val live = src.currentVersion.get
    val changes = src.changesBetween(mv.refreshedThrough.get, live)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltas = changes.groupBy(col("user_id"), col("event"))
      .agg(sum(sign).as("_dcnt"))
    val pred = mv.affectedGroupPredicate(deltas)
    assert(pred.isDefined, "2-column group must still build a point predicate")
    // the predicate prunes: only the affected groups' rows survive it
    val scoped = tgt.readWhere(pred.get)
    assert(scoped.count() > 0)
    assert(scoped.filter(col("event") =!= "view").count() == 0,
      "per-column membership keeps only the touched event value")
    assert(mv.refresh().isDefined)
    matches()

    // delete one composite group entirely: the scoped cleanup erases it
    src.delete(col("user_id") === "u1" && col("event") === "click")
    assert(mv.refresh().isDefined)
    matches()
    assert(mv.read.filter(col("user_id") === "u1" && col("event") === "click")
      .count() == 0)
  }

  test("append-only sources fold appends; count-only views work") {
    import spark.implicits._
    val src = IcebergLikeTable(spark,
      Files.createTempDirectory("mv_app").toString + "/t", "event", Nil)
    val mv = MaterializedAgg(src, viewTable(), Seq("user_id"))
    src.append(rows(0 until 30, "view", 1L, 1L).drop("seq"))
    assert(mv.refresh().isDefined)
    val got1 = mv.read.select("user_id", "cnt")
    assert(got1.exceptAll(mv.fullRecompute).count() == 0)
    src.append(rows(30 until 60, "click", 1L, 1L).drop("seq"))
    assert(mv.refresh().isDefined)
    val got2 = mv.read.select("user_id", "cnt")
    assert(got2.exceptAll(mv.fullRecompute).count() == 0 &&
      mv.fullRecompute.exceptAll(got2).count() == 0)
  }
}
