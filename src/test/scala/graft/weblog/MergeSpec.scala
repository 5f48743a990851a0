package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** One-commit MERGE with a delete clause ([[IcebergLikeTable.merge]]):
  * upserts and key tombstones land in a single snapshot, with
  * order-aware semantics on both (a replayed old delete cannot erase a
  * newer row; ties prefer the delete).
  */
class MergeSpec extends SparkTestBase {

  private def table(): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory("merge_tbl").toString + "/t",
      "event", Seq("k"), numBuckets = 4)

  private def rows(ids: Range, host: String, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", host, v)).toDF("k", "event", "hostname", "seq")
  }

  private def tombs(ids: Range, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", v)).toDF("k", "event", "seq")
  }

  test("upserts and deletes land in ONE snapshot commit") {
    val t = table()
    t.write(rows(0 until 20, "orig", 1L), "seq")
    val v1 = t.currentVersion.get
    // one merge: update k0-k4, insert k20-k22, delete k10-k12
    t.merge(rows(0 until 5, "upd", 2L).unionByName(rows(20 until 23, "new", 2L)),
      tombs(10 until 13, 2L), "seq")
    assert(t.currentVersion.contains(v1 + 1), "exactly one commit")
    assert(t.read.count() == 20) // 20 - 3 + 3
    assert(t.read.filter(col("hostname") === "upd").count() == 5)
    assert(t.read.filter(col("hostname") === "new").count() == 3)
    assert(t.read.filter(col("k").isin("k10", "k11", "k12")).count() == 0)
    // the commit's CDC diff carries updates AND deletes together
    val ch = t.changesBetween(v1, v1 + 1)
    assert(ch.filter(col("_change_type") === "delete").count() == 3)
    assert(ch.filter(col("_change_type") === "update_postimage").count() == 5)
    assert(ch.filter(col("_change_type") === "insert").count() == 3)
  }

  test("a leaf whose batch rows are all winning tombstones drops its files") {
    import spark.implicits._
    // partition rows into two events so one leaf can be fully erased
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("merge_leaf").toString + "/t",
      "event", Seq("k"), numBuckets = 1)
    val base = Seq(("a1", "ea", "x", 1L), ("a2", "ea", "x", 1L),
      ("b1", "eb", "x", 1L)).toDF("k", "event", "hostname", "seq")
    t.write(base, "seq")
    // tombstones for ALL of event=ea: the merged leaf writes no file,
    // yet its previous files must leave the manifest
    t.merge(rows(0 until 0, "none", 2L),
      Seq(("a1", "ea", 2L), ("a2", "ea", 2L)).toDF("k", "event", "seq"),
      "seq")
    assert(t.read.count() == 1)
    assert(t.read.select("k").collect().map(_.getString(0)).toSeq == Seq("b1"))
    // no live file under the erased leaf
    assert(t.resolveLive()._2.files.forall(!_.startsWith("event=ea/")))
  }

  test("order semantics: old deletes lose, ties prefer the delete, absent keys no-op") {
    val t = table()
    t.write(rows(0 until 5, "orig", 5L), "seq")
    // a REPLAYED OLD delete (seq 3 < stored 5) must not erase
    t.merge(rows(0 until 0, "none", 3L), tombs(0 until 2, 3L), "seq")
    assert(t.read.count() == 5, "older tombstones lose the order race")
    // an order TIE prefers the delete (delete-clause-first convention)
    t.merge(rows(1 until 2, "tie", 5L), tombs(1 until 2, 5L), "seq")
    assert(t.read.filter(col("k") === "k1").count() == 0)
    // a tombstone for a key the table never had is a no-op insert-wise
    val before = t.read.count()
    t.merge(rows(0 until 0, "none", 9L), tombs(90 until 93, 9L), "seq")
    assert(t.read.count() == before)
  }

  test("exactly-once: a replayed merge window is skipped whole") {
    val t = table()
    t.write(rows(0 until 10, "orig", 1L), "seq")
    t.merge(rows(0 until 2, "upd", 2L), tombs(5 until 7, 2L), "seq",
      Some(("stream", 7L)))
    val v = t.currentVersion.get
    val snapshot = t.read.collect().toSet
    // replay the same (stream, batch): no commit, no effect
    t.merge(rows(0 until 2, "upd", 2L), tombs(5 until 7, 2L), "seq",
      Some(("stream", 7L)))
    assert(t.currentVersion.contains(v))
    assert(t.read.collect().toSet == snapshot)
  }

  test("null partition values route through upsert, merge and tombstones") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("merge_nullpart").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    // rows whose PARTITION VALUE is null land in the Hive default
    // partition; the merge's leaf routing must find them there
    val base = Seq(("a", Option("e"), "x", 1L), ("b", Option.empty[String], "x", 1L),
      ("c", Option.empty[String], "x", 1L))
      .toDF("k", "event", "hostname", "seq")
    t.write(base, "seq")
    assert(t.read.count() == 3)
    assert(t.read.filter(col("event").isNull).count() == 2)
    // update one null-event row
    t.write(Seq(("b", Option.empty[String], "upd", 2L))
      .toDF("k", "event", "hostname", "seq"), "seq")
    assert(t.read.filter(col("k") === "b").select("hostname")
      .as[String].head() == "upd")
    assert(t.read.count() == 3)
    // tombstone a null-event key through merge
    t.merge(Seq.empty[(String, Option[String], String, Long)]
      .toDF("k", "event", "hostname", "seq"),
      Seq(("c", Option.empty[String], 3L)).toDF("k", "event", "seq"), "seq")
    assert(t.read.count() == 2)
    assert(t.read.filter(col("k") === "c").count() == 0)
    assert(t.read.filter(col("event").isNull).count() == 1)
  }

  test("deleteKeys missing required columns is rejected") {
    import spark.implicits._
    val t = table()
    t.write(rows(0 until 3, "orig", 1L), "seq")
    val noPartition = Seq(("k0", 2L)).toDF("k", "seq")
    intercept[IllegalArgumentException] {
      t.merge(rows(0 until 0, "none", 2L), noPartition, "seq")
    }
  }
}
