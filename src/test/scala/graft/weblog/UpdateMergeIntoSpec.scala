package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import IcebergLikeTable.{MergeDelete, MergeInsert, MergeUpdate}

/** Row-level UPDATE and the generic SQL-semantics MERGE INTO —
  * copy-on-write, candidate-file-scoped, one snapshot commit each.
  */
class UpdateMergeIntoSpec extends SparkTestBase {

  private def freshTable(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t", "event")

  private def base: DataFrame = {
    import spark.implicits._
    Seq(
      ("u1", "view", 10L), ("u2", "view", 20L),
      ("u3", "click", 30L), ("u4", "click", 40L))
      .toDF("user_id", "event", "amount")
  }

  test("update: matched rows rewritten in place, others untouched, count right") {
    val t = freshTable("upd_basic")
    t.append(base.coalesce(1))
    t.append(base.withColumn("user_id", concat(lit("x"), col("user_id"))).coalesce(1))
    val filesBefore = t.filesFor(lit(true)).toSet
    assert(filesBefore.size == 4) // 2 events × 2 appends
    val n = t.update(col("user_id") === "u2", Seq("amount" -> lit(99L)))
    assert(n == 1L)
    assert(t.read.filter(col("user_id") === "u2").head.getAs[Long]("amount") == 99L)
    assert(t.read.count() == 8)
    // only the one file containing u2 was rewritten
    val filesAfter = t.filesFor(lit(true)).toSet
    assert((filesBefore -- filesAfter).size == 1, "exactly one file replaced")
    // assignments see PRE-update values simultaneously
    val m = t.update(col("user_id") === "u3",
      Seq("amount" -> (col("amount") + 1L), "user_id" -> concat(col("user_id"), lit("!"))))
    assert(m == 1L)
    assert(t.read.filter(col("amount") === 31L).head.getAs[String]("user_id") == "u3!")
    // NULL condition keeps rows; zero matches commit nothing
    val v = t.currentVersion.get
    assert(t.update(col("user_id") === "absent", Seq("amount" -> lit(0L))) == 0L)
    assert(t.currentVersion.contains(v))
  }

  test("update: layout guards and keyed-bucket re-derivation") {
    val t = freshTable("upd_guard")
    t.append(base)
    intercept[IllegalArgumentException](
      t.update(lit(true), Seq("event" -> lit("x")))) // physical partition col
    import spark.implicits._
    val keyed = IcebergLikeTable(spark,
      Files.createTempDirectory("upd_keyed").toString + "/t",
      "event", Seq("user_id"), numBuckets = 4)
    keyed.write(base.withColumn("seq", lit(1L)), "seq")
    // updating the unique key re-derives the bucket: the row stays
    // reachable to a later upsert of the NEW key
    assert(keyed.update(col("user_id") === "u1", Seq("user_id" -> lit("u9"))) == 1L)
    assert(keyed.read.filter(col("user_id") === "u9").count() == 1)
    keyed.write(Seq(("u9", "view", 77L, 2L)).toDF("user_id", "event", "amount", "seq"), "seq")
    assert(keyed.read.filter(col("user_id") === "u9").count() == 1)
    assert(keyed.read.filter(col("user_id") === "u9").head.getAs[Long]("amount") == 77L)
  }

  test("mergeInto: insert-only merge never duplicates matched target rows, appends only") {
    import spark.implicits._
    val t = freshTable("mi_insonly")
    t.append(base.coalesce(1))
    val before = t.filesFor(lit(true)).toSet
    // u1 matches TWICE (legal for insert-only MERGE — the cardinality
    // check only applies to update/delete clauses); u9 is new
    val src = Seq(("u1", 1L), ("u1", 2L), ("u9", 900L)).toDF("uid", "amt")
    val r = t.mergeInto(src, on = col("t.user_id") === col("s.uid"),
      notMatched = Seq(MergeInsert(None, Seq(
        "user_id" -> col("s.uid"), "event" -> lit("view"),
        "amount" -> col("s.amt")))))
    assert(r == IcebergLikeTable.MergeIntoResult(0, 0, 1))
    // the multiply-matched target row survives exactly once, value-identical
    assert(t.read.filter(col("user_id") === "u1").count() == 1)
    assert(t.read.filter(col("user_id") === "u1").head.getAs[Long]("amount") == 10L)
    assert(t.read.count() == 5)
    // insert-only merge is an APPEND: every previous file carries by reference
    val after = t.filesFor(lit(true)).toSet
    assert(before.subsetOf(after), "insert-only merge must not rewrite target files")
  }

  test("mergeInto: BY-SOURCE-only merge keeps multiply-matched target rows once") {
    import spark.implicits._
    val t = freshTable("mi_bysrc_dup")
    t.append(base.coalesce(1))
    // u1 matches two source rows; no WHEN MATCHED clause exists, so no
    // cardinality check runs — u1 must still survive exactly once
    val src = Seq(("u1", 1L), ("u1", 2L)).toDF("uid", "amt")
    val r = t.mergeInto(src, on = col("t.user_id") === col("s.uid"),
      notMatchedBySource = Seq(MergeUpdate(None, Seq("amount" -> lit(0L)))))
    assert(r.updated == 3L)
    assert(t.read.count() == 4)
    assert(t.read.filter(col("user_id") === "u1").count() == 1)
    assert(t.read.filter(col("user_id") === "u1").head.getAs[Long]("amount") == 10L)
    assert(t.read.filter(col("amount") === 0L).count() == 3)
  }

  test("update refuses SET on the derived hidden partition column") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("upd_hp_guard").toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    val d1 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    t.append(Seq(("a", d1)).toDF("id", "ts"))
    // commit re-derives pday from ts — accepting the assignment would
    // silently discard it
    val ex = intercept[IllegalArgumentException](
      t.update(col("id") === "a", Seq("pday" -> lit(19785L))))
    assert(ex.getMessage.contains("re-derived"))
  }

  test("update on a hidden-partition source column migrates the row's leaf") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("upd_hp").toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    val d1 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val d2 = java.sql.Timestamp.valueOf("2024-03-02 10:00:00")
    t.append(Seq(("a", d1), ("b", d1)).toDF("id", "ts"))
    assert(t.update(col("id") === "a", Seq("ts" -> lit(d2))) == 1L)
    // the updated row is readable through day-2 pruning
    val day2 = col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-03 00:00:00"))
    assert(t.readWhere(day2).count() == 1)
    assert(t.filesFor(day2).forall(_.startsWith("pday=19784")))
  }

  test("mergeInto: full clause algebra with SQL semantics") {
    import spark.implicits._
    val t = freshTable("mi_full")
    t.append(base.coalesce(1))
    val source = Seq(
      ("u1", 111L),  // matched → update
      ("u3", -1L),   // matched + delete condition → delete
      ("u9", 900L))  // not matched → insert
      .toDF("uid", "amt")
    val r = t.mergeInto(
      source,
      on = col("t.user_id") === col("s.uid"),
      matched = Seq(
        MergeDelete(Some(col("s.amt") < 0L)),
        MergeUpdate(None, Seq("amount" -> col("s.amt")))),
      notMatched = Seq(
        MergeInsert(None, Seq(
          "user_id" -> col("s.uid"), "event" -> lit("view"),
          "amount" -> col("s.amt")))),
      notMatchedBySource = Seq(
        MergeUpdate(Some(col("t.amount") >= 40L),
          Seq("amount" -> (col("t.amount") * 2L)))))
    assert(r == IcebergLikeTable.MergeIntoResult(updated = 2, deleted = 1, inserted = 1))
    val rows = t.read.orderBy("user_id").collect()
      .map(x => (x.getAs[String]("user_id"), x.getAs[Long]("amount"))).toSeq
    assert(rows == Seq(
      ("u1", 111L),  // updated from source
      ("u2", 20L),   // untouched (not matched by source, condition false)
      ("u4", 80L),   // not-matched-by-source update doubled it
      ("u9", 900L))) // inserted
    assert(t.read.filter(col("user_id") === "u3").count() == 0) // deleted
  }

  test("mergeInto: clause order wins, NULL conditions don't match, cardinality check") {
    import spark.implicits._
    val t = freshTable("mi_order")
    t.append(base.coalesce(1))
    // first satisfied clause wins: the conditional update fires before
    // the catch-all delete for u1; NULL condition (null amt) skips to
    // the next clause for u2
    val source = Seq(("u1", Some(5L)), ("u2", None)).toDF("uid", "amt")
    t.mergeInto(
      source,
      on = col("t.user_id") === col("s.uid"),
      matched = Seq(
        MergeUpdate(Some(col("s.amt").isNotNull), Seq("amount" -> col("s.amt"))),
        MergeDelete(None)))
    val left = t.read.orderBy("user_id").collect()
      .map(x => (x.getAs[String]("user_id"), x.getAs[Long]("amount"))).toSeq
    assert(left == Seq(("u1", 5L), ("u3", 30L), ("u4", 40L)),
      s"got $left") // u2's NULL-condition update skipped → deleted by catch-all
    // cardinality: two source rows for one target key must fail
    val dup = Seq(("u3", 1L), ("u3", 2L)).toDF("uid", "amt")
    intercept[IllegalArgumentException](
      t.mergeInto(dup, on = col("t.user_id") === col("s.uid"),
        matched = Seq(MergeUpdate(None, Seq("amount" -> col("s.amt"))))))
    // insert-only merges skip the check (SQL allows duplicate inserts)
    val r = t.mergeInto(dup, on = col("t.user_id") === col("s.uid") && lit(false),
      notMatched = Seq(MergeInsert(None, Seq(
        "user_id" -> concat(col("s.uid"), col("s.amt")),
        "event" -> lit("view"), "amount" -> col("s.amt")))))
    assert(r.inserted == 2L)
  }

  test("mergeInto: dynamic source-key pruning; BY SOURCE refuses pruning") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mi_dyn").toString + "/t", "event",
      statsColumns = Seq("user_id"))
    t.appendClustered(base.filter(col("event") === "view"), Seq("user_id"), nFiles = 1)
    t.appendClustered(base.filter(col("event") === "click"), Seq("user_id"), nFiles = 1)
    val before = t.filesFor(lit(true)).toSet
    // NO static candidate predicate: the bounded source-key collect +
    // stamped bounds cut the candidate set on their own
    val r = t.mergeInto(Seq(("u4", 444L)).toDF("uid", "amt"),
      on = col("t.user_id") === col("s.uid"),
      matched = Seq(MergeUpdate(None, Seq("amount" -> col("s.amt")))),
      equiKeys = Seq("user_id" -> col("uid")))
    assert(r.updated == 1L)
    val after = t.filesFor(lit(true)).toSet
    assert((before -- after).size == 1,
      "dynamic key pruning must rewrite only the file containing u4")
    assert(t.read.filter(col("user_id") === "u4").head.getAs[Long]("amount") == 444L)
    assert(t.read.count() == 4)

    // NOT MATCHED BY SOURCE acts on the rows pruning would skip — the
    // combination must refuse loudly instead of silently under-updating
    intercept[IllegalArgumentException](
      t.mergeInto(Seq(("u4", 1L)).toDF("uid", "amt"),
        on = col("t.user_id") === col("s.uid"),
        notMatchedBySource = Seq(MergeUpdate(None, Seq("amount" -> lit(0L)))),
        equiKeys = Seq("user_id" -> col("uid"))))
    // and a BY SOURCE merge without pruning touches everything correctly
    val r2 = t.mergeInto(Seq(("u4", 1L)).toDF("uid", "amt"),
      on = col("t.user_id") === col("s.uid"),
      notMatchedBySource = Seq(MergeUpdate(None, Seq("amount" -> lit(0L)))))
    assert(r2.updated == 3L)
    assert(t.read.filter(col("amount") === 0L).count() == 3)
  }

  test("mergeInto schemaEvolution: source-only column is added; carried old files read NULL") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mrg_evolve").toString + "/t", "event",
      statsColumns = Seq("user_id"))
    // two files with disjoint user_id ranges — the second must survive
    // the evolving merge UNTOUCHED (dynamic key pruning scopes the
    // rewrite) and still read the new column as NULL
    t.append(Seq(("a1", "view", 1L), ("a2", "view", 2L))
      .toDF("user_id", "event", "amount").coalesce(1))
    t.append(Seq(("z8", "view", 8L), ("z9", "view", 9L))
      .toDF("user_id", "event", "amount").coalesce(1))
    val before = t.filesFor(lit(true)).toSet
    val src = Seq(("a1", 100L), ("a7", 700L)).toDF("uid", "score")
    // evolution OFF: the unknown assignment is ignored, no new column
    t.mergeInto(src, on = col("t.user_id") === col("s.uid"),
      matched = Seq(MergeUpdate(None, Seq("score" -> col("s.score")))),
      equiKeys = Seq("user_id" -> col("uid")))
    assert(!t.read.columns.contains("score"),
      "without schemaEvolution the new column must not appear")
    // evolution ON: column added (typed from the source), matched row
    // scored, not-matched inserted, z-file carried by reference
    val res = t.mergeInto(src, on = col("t.user_id") === col("s.uid"),
      matched = Seq(MergeUpdate(None, Seq("score" -> col("s.score")))),
      notMatched = Seq(MergeInsert(None, Seq(
        "user_id" -> col("s.uid"), "event" -> lit("view"),
        "score" -> col("s.score")))),
      equiKeys = Seq("user_id" -> col("uid")),
      schemaEvolution = true)
    assert(res.updated == 1L && res.inserted == 1L)
    assert(t.read.columns.contains("score"))
    assert(t.read.schema("score").dataType ==
      org.apache.spark.sql.types.LongType, "type comes from the source")
    val after = t.filesFor(lit(true)).toSet
    assert(before.exists(after.contains),
      "the unimplicated old file must carry over by reference")
    val rows = t.read.orderBy("user_id").collect()
      .map(r => (r.getAs[String]("user_id"),
        Option(r.getAs[java.lang.Long]("score")).map(_.toLong))).toSeq
    assert(rows == Seq(
      ("a1", Some(100L)), ("a2", None), ("a7", Some(700L)),
      ("z8", None), ("z9", None)),
      s"old-file rows must read NULL through the widened stamp: $rows")
  }

  test("update: CDC across the commit shows only truly changed rows") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("upd_cdc").toString + "/t",
      "event", Seq("user_id"), numBuckets = 2)
    t.write(base.withColumn("seq", lit(1L)), "seq")
    val v1 = t.currentVersion.get
    t.update(col("user_id") === "u2", Seq("amount" -> lit(99L)))
    val v2 = t.currentVersion.get
    val ch = t.changesBetween(v1, v2)
    // the file rewrite carried u1/u3/u4 value-identical — suppressed;
    // only u2's pre/post images surface
    assert(ch.count() == 2)
    val types = ch.select("_change_type", "user_id").collect()
      .map(r => (r.getString(0), r.getAs[String]("user_id"))).toSet
    assert(types == Set(("update_preimage", "u2"), ("update_postimage", "u2")))
  }

  test("maintainWhere: partition-scoped compaction touches only implied leaves") {
    val t = freshTable("mw")
    for (_ <- 1 to 3) t.append(base.coalesce(1)) // 3 files per event leaf
    val before = t.filesFor(lit(true))
    assert(before.count(_.startsWith("event=view/")) == 3)
    val rewritten = t.maintainWhere(col("event") === "view")
    assert(rewritten == Seq("view"))
    val after = t.filesFor(lit(true))
    assert(after.count(_.startsWith("event=view/")) == 1, "view compacted")
    assert(after.count(_.startsWith("event=click/")) == 3, "click untouched")
    assert(before.filter(_.startsWith("event=click/")).toSet ==
      after.filter(_.startsWith("event=click/")).toSet)
    assert(t.read.count() == 12)
    // a predicate implying nothing is a no-op commit-wise
    val v = t.currentVersion.get
    assert(t.maintainWhere(col("event") === "absent").isEmpty)
    assert(t.currentVersion.contains(v))
  }

  test("mergeInto: candidate pruning rewrites only implied files") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mi_prune").toString + "/t", "event",
      statsColumns = Seq("user_id"))
    // one file per event from two clustered appends
    t.appendClustered(base.filter(col("event") === "view"), Seq("user_id"), nFiles = 1)
    t.appendClustered(base.filter(col("event") === "click"), Seq("user_id"), nFiles = 1)
    val before = t.filesFor(lit(true)).toSet
    val src = Seq(("u1", 111L)).toDF("uid", "amt")
    t.mergeInto(src, on = col("t.user_id") === col("s.uid"),
      matched = Seq(MergeUpdate(None, Seq("amount" -> col("s.amt")))),
      candidatePredicate = Some(col("user_id") === "u1"))
    val after = t.filesFor(lit(true)).toSet
    assert((before -- after).size == 1,
      "only the stats-implied candidate file may be rewritten")
    assert(t.read.filter(col("user_id") === "u1").head.getAs[Long]("amount") == 111L)
    assert(t.read.count() == 4)
  }
}
