package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Size-based binpack compaction: the plan comes from manifest-stamped
  * byte sizes alone, small files merge per leaf, large files are never
  * rewritten, rows and MOR-delete semantics are preserved.
  */
class MaintainBySizeSpec extends SparkTestBase {

  private def table(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t", "event")

  private def rows(ids: Range, pad: Int): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", if (i % 2 == 0) "view" else "click", "x" * pad))
      .toDF("k", "event", "payload")
  }

  test("small files merge per leaf; large files stay untouched") {
    val t = table("mbs_basic")
    // 6 small appends + 1 large one
    for (b <- 0 until 6) t.append(rows(b * 10 until (b + 1) * 10, 10).coalesce(1))
    t.append(rows(100 until 200, 20000).coalesce(1))
    val before = t.read.count()
    val files = t.files.select("file", "size_bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val largeFiles = files.filter(_._2 >= 100000).keySet
    val nBefore = files.size
    val rewritten = t.maintainBySize(targetFileBytes = 1L << 20)
    assert(rewritten.nonEmpty)
    val after = t.files.select("file").collect().map(_.getString(0)).toSet
    assert(largeFiles.subsetOf(after), "large files must carry over untouched")
    assert(after.size < nBefore, "file count must shrink")
    assert(t.read.count() == before, "row set preserved")
    // idempotent: a second pass finds nothing to do (no new snapshot)
    val v = t.currentVersion.get
    assert(t.maintainBySize(1L << 20).isEmpty)
    assert(t.currentVersion.contains(v))
  }

  test("target size splits a leaf's merged output into multiple files") {
    val t = table("mbs_split")
    // ~40 KB per append into one leaf family, tiny target → >1 slice
    for (b <- 0 until 8) t.append(rows(b * 50 until (b + 1) * 50, 800)
      .filter(col("event") === "view").coalesce(1))
    val bytes = t.files.agg(sum("size_bytes")).collect()(0).getLong(0)
    val target = bytes / 3
    val before = t.read.count()
    assert(t.maintainBySize(target).nonEmpty)
    val nAfter = t.files.count()
    assert(nAfter > 1 && nAfter < 8, s"expected 2..7 files, got $nAfter")
    assert(t.read.count() == before)
  }

  test("binpack applies MOR deletes to rewritten rows and keeps masks for others") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mbs_mor").toString + "/t", "event",
      uniqueKeys = Seq("k"), numBuckets = 1)
    import spark.implicits._
    def keyed(ids: Range, pad: Int) =
      ids.map(i => (s"k$i", "view", "x" * pad, 1L)).toDF("k", "event", "payload", "seq")
    // two small files + one large file in the same leaf
    t.write(keyed(0 until 5, 10), "seq")
    t.write(keyed(5 until 10, 10).withColumn("seq", lit(2L)), "seq")
    // a MOR delete masking one row in the small set
    t.deleteMergeOnRead(col("k") === "k2")
    val before = t.read.collect().map(_.getString(0)).toSet
    assert(!before.contains("k2") && before.size == 9)
    t.maintainBySize(targetFileBytes = 1L << 20)
    val after = t.read.collect().map(_.getString(0)).toSet
    assert(after == before, "rewrite must not resurrect the masked row")
  }

  test("an empty or all-large table is a metadata-only no-op") {
    val t = table("mbs_noop")
    assert(t.maintainBySize(1L << 20).isEmpty)
    t.append(rows(0 until 50, 20000).coalesce(1))
    val v = t.currentVersion.get
    assert(t.maintainBySize(1000L).isEmpty) // every file is above 75% of target
    assert(t.currentVersion.contains(v))
  }
}
