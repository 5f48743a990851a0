package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Merge-on-read equality-delete files (Iceberg v2 semantics — the
  * reference's `optimize_rewrite_delete_file_threshold` posture):
  * row-for-row equivalence with copy-on-write delete, identical CDC
  * either way, sequence-scoped re-inserts, threshold compaction that
  * consumes the tombstones, and GC of expired delete files.
  */
class IcebergMorDeleteSpec extends SparkTestBase {

  private def table(name: String, buckets: Int = 4): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      "event", Seq("k"), numBuckets = buckets)

  private def rows(ids: Range, host: String, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", if (i % 2 == 0) "view" else "click", host, v))
      .toDF("k", "event", "hostname", "seq")
  }

  private def collectSet(df: DataFrame): Set[String] =
    df.select("k", "event", "hostname", "seq")
      .collect().map(_.mkString("|")).toSet

  test("merge-on-read delete equals copy-on-write row for row, without rewriting data files") {
    val mor = table("mor_eq")
    val cow = table("cow_eq")
    Seq(mor, cow).foreach { t =>
      t.write(rows(0 until 40, "orig", 1L), "seq")
      t.write(rows(10 until 20, "gen2", 2L), "seq")
    }
    val cond = col("hostname") === "orig" && col("event") === "view"

    val dataBefore = mor.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    val nMor = mor.deleteMergeOnRead(cond)
    val nCow = cow.delete(cond)
    assert(nMor == nCow && nMor > 0, s"same deleted count ($nMor vs $nCow)")
    assert(collectSet(mor.read) == collectSet(cow.read))
    // the MOR commit was purely additive metadata: every previous data
    // file is still live and untouched, only eqdel files were added
    val dataAfter = mor.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    assert(dataAfter == dataBefore, "no data file rewritten or dropped")
    val delFiles = mor.files.filter(col("is_delete")).collect()
    assert(delFiles.nonEmpty)
    assert(delFiles.forall(_.getAs[String]("file").contains("eqdel-")))
    // readWhere, toDF and filesFor-backed pruning all see the same rows
    assert(collectSet(mor.readWhere(col("event") === "view")) ==
      collectSet(cow.read.filter(col("event") === "view")))
    assert(collectSet(mor.toDF.select("k", "event", "hostname", "seq")) ==
      collectSet(cow.read))
  }

  test("CDC changelog is identical under merge-on-read and copy-on-write") {
    val mor = table("mor_cdc")
    val cow = table("cow_cdc")
    Seq(mor, cow).foreach(t => t.write(rows(0 until 30, "orig", 1L), "seq"))
    val cond = col("k").isin("k3", "k7", "k8", "k20")
    mor.deleteMergeOnRead(cond)
    cow.delete(cond)
    def changes(t: IcebergLikeTable): Set[String] =
      t.changesBetween(1L, 2L)
        .select("_change_type", "k", "event", "hostname", "seq")
        .collect().map(_.mkString("|")).toSet
    val morC = changes(mor)
    assert(morC == changes(cow))
    assert(morC.count(_.startsWith("delete|")) == 4)
    // and the incremental consumer surface (ChangeFeed) delivers it
    val feed = ChangeFeed(mor, "c")
    // drain pre-delete window first so the delete arrives incrementally
    val all = feed.poll().get
    assert(all.toVersion == 2L) // both commits in one window: 26 inserts
    assert(all.changes.filter(col("_change_type") === "insert").count() == 26)
  }

  test("sequence scoping: a later upsert re-inserts the key past the tombstone") {
    val t = table("mor_seq")
    t.write(rows(0 until 10, "orig", 1L), "seq")
    assert(t.deleteMergeOnRead(col("k") === "k4") == 1L)
    assert(t.read.filter(col("k") === "k4").count() == 0)
    // re-insert the same key AFTER the delete: the new data file's
    // write sequence is above the tombstone's, so it must survive
    t.write(rows(4 until 5, "reborn", 3L), "seq")
    val reborn = t.read.filter(col("k") === "k4")
    assert(reborn.count() == 1)
    assert(reborn.select("hostname").head.getString(0) == "reborn")
    // a second MOR delete then removes the reborn row (new tombstone,
    // higher sequence) — generations compose
    assert(t.deleteMergeOnRead(col("k") === "k4") == 1L)
    assert(t.read.filter(col("k") === "k4").count() == 0)
    // deleting an already-deleted key is a no-op, not a re-count
    assert(t.deleteMergeOnRead(col("k") === "k4") == 0L)
  }

  test("maintain() past the delete-file threshold consumes the tombstones") {
    val t = table("mor_maint", buckets = 1)
    t.write(rows(0 until 40, "orig", 1L), "seq")
    // accumulate MOR deletes on the same leaves — one delete file per
    // affected leaf per commit; 20 single-key deletes = 10 per (view,
    // click) leaf, exactly at the reference's threshold
    for (i <- 0 until 20) t.deleteMergeOnRead(col("k") === s"k$i")
    val delCount = t.files.filter(col("is_delete")).count()
    assert(delCount == 20, s"accumulated $delCount delete files")
    val before = collectSet(t.read)
    assert(before.size == 20)
    // threshold 10 (the reference's knob): both leaves are past it
    val rewritten = t.maintain(fileThreshold = 1000, deleteFileThreshold = 10)
    assert(rewritten.nonEmpty, "delete-file count alone must trigger the rewrite")
    assert(t.files.filter(col("is_delete")).count() == 0,
      "compaction consumes the delete files")
    assert(collectSet(t.read) == before, "rewrite preserves the row set")
    // CDC across the maintain commit: zero change rows (pure rewrite)
    val live = t.currentVersion.get
    assert(t.changesBetween(live - 1, live).count() == 0)
    // metadata-only count works again once the deletes are compacted
    assert(t.rowCount.contains(20L))
  }

  test("metadata answers stay honest while delete files are live") {
    val t = table("mor_meta")
    t.write(rows(0 until 20, "orig", 1L), "seq")
    assert(t.rowCount.contains(20L))
    t.deleteMergeOnRead(col("k") === "k1")
    assert(t.rowCount.isEmpty, "count undecidable from metadata under MOR deletes")
    assert(t.columnMinMax("seq").isEmpty)
    assert(t.read.count() == 19)
  }

  test("retention GC sweeps consumed delete files with their snapshots") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mor_gc").toString + "/t",
      "event", Seq("k"), numBuckets = 2, retainVersions = 1)
    t.write(rows(0 until 10, "orig", 1L), "seq")
    t.deleteMergeOnRead(col("k") === "k2")
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def eqdelOnDisk(): Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(t.path), true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.startsWith("eqdel-")) n += 1
      n
    }
    assert(eqdelOnDisk() == 1)
    // compaction consumes the tombstone; retention 1 then expires the
    // MOR snapshot, and vacuum sweeps the now-unreferenced eqdel file
    t.maintain(fileThreshold = 0, deleteFileThreshold = 1)
    t.vacuum()
    assert(eqdelOnDisk() == 0, "expired delete files are swept")
    assert(collectSet(t.read).size == 9)
  }

  test("copy-on-write delete composes with live tombstones (no resurrection, no recount)") {
    val t = table("mor_mix")
    t.write(rows(0 until 20, "orig", 1L), "seq")
    assert(t.deleteMergeOnRead(col("k").isin("k1", "k2")) == 2L)
    // COW delete on an overlapping predicate: must not count the
    // already-tombstoned rows, and its rewrite must not resurrect them
    val n = t.delete(col("event") === "click") // k1..k19 odd
    assert(n == 9L, s"k1 was already MOR-deleted; counted $n")
    assert(t.read.count() == 9) // evens minus k2
    assert(t.read.filter(col("k").isin("k1", "k2")).count() == 0)
  }
}
