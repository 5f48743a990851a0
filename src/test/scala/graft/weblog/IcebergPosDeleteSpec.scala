package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Positional delete files (Iceberg v2's second delete-file kind — the
  * one Athena writes, whose count the reference's
  * `optimize_rewrite_delete_file_threshold` knob thresholds): rows
  * addressed by (data-file path, row ordinal) from the parquet
  * reader's own `_metadata.row_index`. Row-for-row equivalence with
  * copy-on-write delete, KEY-LESS table support (equality deletes
  * can't), identical CDC, threshold compaction, schema-evolution
  * composition, and the no-user-data-in-tombstone property.
  */
class IcebergPosDeleteSpec extends SparkTestBase {

  private def keyed(name: String, buckets: Int = 4): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      "event", Seq("k"), numBuckets = buckets)

  private def keyless(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t", "event")

  private def rows(ids: Range, host: String, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", if (i % 2 == 0) "view" else "click", host, v))
      .toDF("k", "event", "hostname", "seq")
  }

  private def collectSet(df: DataFrame): Set[String] =
    df.select("k", "event", "hostname", "seq")
      .collect().map(_.mkString("|")).toSet

  test("positional delete equals copy-on-write row for row, without touching data files") {
    val pos = keyed("pos_eq")
    val cow = keyed("cow_eq2")
    Seq(pos, cow).foreach { t =>
      t.write(rows(0 until 40, "orig", 1L), "seq")
      t.write(rows(10 until 20, "gen2", 2L), "seq")
    }
    val cond = col("hostname") === "orig" && col("event") === "view"
    val dataBefore = pos.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    val nPos = pos.deletePositional(cond)
    val nCow = cow.delete(cond)
    assert(nPos == nCow && nPos > 0, s"same deleted count ($nPos vs $nCow)")
    assert(collectSet(pos.read) == collectSet(cow.read))
    val dataAfter = pos.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    assert(dataAfter == dataBefore, "no data file rewritten or dropped")
    val delFiles = pos.files.filter(col("is_delete")).collect()
    assert(delFiles.nonEmpty)
    assert(delFiles.forall(_.getAs[String]("file").contains("posdel-")))
    assert(collectSet(pos.readWhere(col("event") === "view")) ==
      collectSet(cow.read.filter(col("event") === "view")))
    assert(collectSet(pos.toDF.select("k", "event", "hostname", "seq")) ==
      collectSet(cow.read))
  }

  test("key-less tables get merge-on-read deletes (equality files can't)") {
    val t = keyless("pos_keyless")
    import spark.implicits._
    val day1 = (0 until 30).map(i => (s"k$i", if (i % 2 == 0) "view" else "click", 1))
      .toDF("k", "event", "day")
    t.append(day1)
    intercept[IllegalArgumentException](t.deleteMergeOnRead(col("day") === 1))
    val preVersion = t.currentVersion.get
    assert(t.deletePositional(col("event") === "click" && col("k") < "k2") > 0)
    val live = t.read.select("k").as[String].collect().toSet
    assert(!live.exists(k => k < "k2" && k.stripPrefix("k").toInt % 2 == 1))
    assert(live.count(_.startsWith("k")) == t.read.count())
    // time travel to the pre-delete snapshot still shows every row
    assert(t.readAt(preVersion).count() == 30)
    // appendsBetween refuses a window that spans the delete (the
    // incremental contract is append-only) but works before it
    intercept[IllegalArgumentException](
      t.appendsBetween(preVersion, t.currentVersion.get).count())
  }

  test("CDC changelog is identical under positional and copy-on-write delete") {
    val pos = keyed("pos_cdc")
    val cow = keyed("cow_cdc2")
    Seq(pos, cow).foreach(t => t.write(rows(0 until 30, "orig", 1L), "seq"))
    val cond = col("k").isin("k3", "k7", "k8", "k20")
    pos.deletePositional(cond)
    cow.delete(cond)
    def changes(t: IcebergLikeTable): Set[String] =
      t.changesBetween(1L, 2L)
        .select("_change_type", "k", "event", "hostname", "seq")
        .collect().map(_.mkString("|")).toSet
    val posC = changes(pos)
    assert(posC == changes(cow))
    assert(posC.count(_.startsWith("delete|")) == 4)
  }

  test("maintain() past the delete-file threshold consumes positional files") {
    val t = keyed("pos_maint", buckets = 1)
    t.write(rows(0 until 40, "orig", 1L), "seq")
    for (i <- 0 until 20) t.deletePositional(col("k") === s"k$i")
    assert(t.files.filter(col("is_delete")).count() == 20)
    val before = collectSet(t.read)
    assert(before.size == 20)
    val rewritten = t.maintain(fileThreshold = 1000, deleteFileThreshold = 10)
    assert(rewritten.nonEmpty)
    assert(t.files.filter(col("is_delete")).count() == 0,
      "compaction consumes the positional files")
    assert(collectSet(t.read) == before)
    val live = t.currentVersion.get
    assert(t.changesBetween(live - 1, live).count() == 0,
      "a pure rewrite emits zero CDC rows")
    assert(t.rowCount.contains(20L),
      "metadata-only count resumes once deletes are compacted")
  }

  test("metadata answers stay honest while positional files are live") {
    val t = keyed("pos_meta")
    t.write(rows(0 until 20, "orig", 1L), "seq")
    assert(t.rowCount.contains(20L))
    t.deletePositional(col("k") === "k1")
    assert(t.rowCount.isEmpty)
    assert(t.columnMinMax("seq").isEmpty)
    assert(t.read.count() == 19)
  }

  test("rowCountAt answers pinned versions from the manifest, refusing under tombstones") {
    val t = keyed("pos_meta_at")
    t.write(rows(0 until 20, "orig", 1L), "seq")
    val clean = t.currentVersion.get
    t.deletePositional(col("k") === "k1")
    val masked = t.currentVersion.get
    // the pre-delete snapshot has no delete files: manifest answers,
    // and it must equal the real time-travel scan
    assert(t.rowCountAt(clean).contains(20L))
    assert(t.rowCountAt(clean).contains(t.readAt(clean).count()))
    // the tombstoned snapshot refuses (how many tuples hit is a data
    // question), same rule as the live rowCount
    assert(t.rowCountAt(masked).isEmpty)
    // compaction consumes the tombstones; the pinned count resumes
    t.maintain(fileThreshold = 1000, targetFiles = 1, deleteFileThreshold = 1)
    assert(t.rowCountAt(t.currentVersion.get).contains(19L))
  }

  test("overlapping deletes never re-count; positional composes with equality tombstones") {
    val t = keyed("pos_mix")
    t.write(rows(0 until 20, "orig", 1L), "seq")
    assert(t.deletePositional(col("k").isin("k1", "k2")) == 2L)
    // a second positional delete over an overlapping predicate counts
    // only MOR-live rows — tuples stay disjoint across commits
    assert(t.deletePositional(col("k").isin("k2", "k4")) == 1L)
    // an EQUALITY tombstone on top (mixed kinds in one snapshot)
    assert(t.deleteMergeOnRead(col("k") === "k6") == 1L)
    assert(t.read.count() == 16)
    assert(t.read.filter(col("k").isin("k1", "k2", "k4", "k6")).count() == 0)
    // and a COW delete composes with both kinds live
    assert(t.delete(col("event") === "click") == 9L) // odds minus k1
    assert(t.read.count() == 7) // evens minus k2, k4, k6
  }

  test("an upsert rewriting a masked leaf neither resurrects nor double-applies") {
    val t = keyed("pos_upsert", buckets = 1)
    t.write(rows(0 until 10, "orig", 1L), "seq")
    assert(t.deletePositional(col("k") === "k3") == 1L)
    // rewrite the click leaf (k3 is odd → click): survivors carry over,
    // the masked row must not resurrect through the new data files
    t.write(rows(5 until 6, "gen2", 2L), "seq")
    assert(t.read.filter(col("k") === "k3").count() == 0)
    assert(t.read.count() == 9)
    assert(t.read.filter(col("k") === "k5").select("hostname")
      .head.getString(0) == "gen2")
  }

  test("positional files survive schema evolution (epoch-aware reads attach ordinals)") {
    val t = keyed("pos_evolve")
    t.write(rows(0 until 12, "orig", 1L), "seq")
    assert(t.deletePositional(col("k") === "k2") == 1L)
    t.renameColumn("hostname", "server")
    // old-epoch files read under their physical names WITH ordinals;
    // the tombstone still masks k2 across the rename
    assert(t.read.filter(col("k") === "k2").count() == 0)
    assert(t.read.count() == 11)
    assert(t.read.select("server").distinct().head.getString(0) == "orig")
    // and a positional delete issued ON the evolved table works too
    assert(t.deletePositional(col("server") === "orig" && col("k") === "k4") == 1L)
    assert(t.read.count() == 10)
  }

  test("the tombstone itself contains no table data (GDPR-clean delete files)") {
    val t = keyed("pos_gdpr")
    t.write(rows(0 until 10, "secret-host", 1L), "seq")
    t.deletePositional(col("k") === "k7")
    val delPaths = t.files.filter(col("is_delete"))
      .select("file").collect().map(_.getString(0))
    assert(delPaths.nonEmpty)
    val df = spark.read.parquet(delPaths.map(p => s"${t.path}/$p"): _*)
    assert(df.columns.toSet == Set("_file", "_pos"),
      s"positional files carry only (file, ordinal): ${df.columns.mkString(",")}")
    val tuples = df.collect()
    assert(tuples.length == 1)
    assert(tuples.head.getAs[String]("_file").contains("part-v"))
  }
}
