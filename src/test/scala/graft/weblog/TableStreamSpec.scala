package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Table-as-stream-source ([[TableStream]]): AvailableNow drains over
  * the change feed, foreachBatch-style processing with post-process
  * acks, and the packaged replica maintenance — exactly-once end to
  * end under replays and crash-before-ack.
  */
class TableStreamSpec extends SparkTestBase {

  private def keyed(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      "event", Seq("k"), numBuckets = 4)

  private def batchOf(ids: Range, host: String, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", host, v)).toDF("k", "event", "hostname", "seq")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"mirror diverged: ${a.collect().toSeq} vs ${b.collect().toSeq}")

  private def mirrorEqualsSource(src: IcebergLikeTable,
      tgt: IcebergLikeTable): Unit =
    sameRows(tgt.read.drop("_commit_version"), src.read)

  test("mirror tracks inserts, updates and deletes across drains") {
    val src = keyed("ts_src")
    val tgt = keyed("ts_tgt")
    src.write(batchOf(0 until 50, "orig", 1L), "seq")
    assert(TableStream.mirrorInto(src, tgt, "m") == 1)
    mirrorEqualsSource(src, tgt)

    // update a slice + delete a slice, one drain folds both commits
    src.write(batchOf(0 until 10, "updated", 2L), "seq")
    src.delete(col("k").isin("k20", "k21", "k22"))
    assert(TableStream.mirrorInto(src, tgt, "m") == 1)
    mirrorEqualsSource(src, tgt)
    assert(tgt.read.count() == 47)
    assert(tgt.read.filter(col("hostname") === "updated").count() == 10)

    // caught up: the next drain is a no-op
    assert(TableStream.mirrorInto(src, tgt, "m") == 0)

    // delete-then-reinsert round-trips
    src.write(batchOf(20 until 23, "back", 3L), "seq")
    assert(TableStream.mirrorInto(src, tgt, "m") == 1)
    mirrorEqualsSource(src, tgt)
    assert(tgt.read.filter(col("hostname") === "back").count() == 3)
  }

  test("replayed windows are exactly-once: re-applying changes nothing") {
    val src = keyed("ts_replay_src")
    val tgt = keyed("ts_replay_tgt")
    src.write(batchOf(0 until 20, "orig", 1L), "seq")
    val feed = ChangeFeed(src, "m")
    val b = feed.poll().get
    val info = TableStream.BatchInfo(b.fromVersion, b.toVersion)
    TableStream.applyChanges(tgt, "m", b.changes, info)
    val v = tgt.currentVersion.get
    // crash before ack: the SAME window is delivered and applied again —
    // the upsert's appendId high-water mark skips it without a commit
    TableStream.applyChanges(tgt, "m", b.changes, info)
    assert(tgt.currentVersion.contains(v), "replay must not commit")
    b.ack()
    mirrorEqualsSource(src, tgt)
  }

  test("a processor crash re-delivers the window on the next drain") {
    val src = keyed("ts_crash_src")
    val tgt = keyed("ts_crash_tgt")
    src.write(batchOf(0 until 10, "orig", 1L), "seq")
    var calls = 0
    intercept[RuntimeException] {
      TableStream.processAvailableNow(src, "m") { (_, _) =>
        calls += 1; throw new RuntimeException("boom")
      }
    }
    assert(calls == 1)
    // cursor never advanced: the retry processes the same window
    assert(TableStream.mirrorInto(src, tgt, "m") == 1)
    mirrorEqualsSource(src, tgt)
  }

  test("chunked initial load: bounded windows, crash-resume, no loss or double-count") {
    val src = keyed("ts_chunk_src") // 4 buckets × 1 event → 4 leaves
    val tgt = keyed("ts_chunk_tgt")
    src.write(batchOf(0 until 60, "orig", 1L), "seq")

    // 4 leaves at 1 leaf/window → the initial load is 4 bounded windows
    var chunks = Vector.empty[(Int, Int)]
    val n = TableStream.processAvailableNow(src, "m", Int.MaxValue, 1) {
      (changes, info) =>
        chunks :+= info.chunk.get
        TableStream.applyChanges(tgt, "m", changes, info)
    }
    assert(n == 4, s"expected 4 chunk windows, drained $n")
    assert(chunks == Vector((0, 4), (1, 4), (2, 4), (3, 4)))
    mirrorEqualsSource(src, tgt)
    assert(tgt.read.count() == 60)
    // caught up — and the chunk ids were all distinct (a shared batch
    // id would have made the mirror's high-water mark skip chunks 2-4)
    assert(TableStream.mirrorInto(src, tgt, "m") == 0)

    // crash mid-load on a FRESH consumer: two chunks applied, then die
    val tgt2 = keyed("ts_chunk_tgt2")
    var applied = 0
    intercept[RuntimeException] {
      TableStream.processAvailableNow(src, "m2", Int.MaxValue, 1) {
        (changes, info) =>
          applied += 1
          if (applied == 3) throw new RuntimeException("crash mid-load")
          TableStream.applyChanges(tgt2, "m2", changes, info)
      }
    }
    // resume: the unacked 3rd chunk re-delivers first, then the 4th —
    // no chunk lost, none double-applied
    val resumed = TableStream.processAvailableNow(src, "m2", Int.MaxValue, 1) {
      (changes, info) => TableStream.applyChanges(tgt2, "m2", changes, info)
    }
    assert(resumed == 2, s"resume must drain exactly the 2 remaining chunks, got $resumed")
    mirrorEqualsSource(src, tgt2)

    // post-load incrementality: a source commit after the chunked load
    // arrives as one normal changes window
    src.write(batchOf(0 until 5, "gen2", 2L), "seq")
    assert(TableStream.mirrorInto(src, tgt2, "m2") == 1)
    mirrorEqualsSource(src, tgt2)
  }

  test("commits landing mid-initial-load arrive as a later incremental window") {
    val src = keyed("ts_midload_src")
    val tgt = keyed("ts_midload_tgt")
    src.write(batchOf(0 until 40, "orig", 1L), "seq")
    val feed = ChangeFeed(src, "m3", initialChunkLeaves = 1)
    // drain two of four chunks, then a concurrent commit lands
    for (_ <- 0 until 2) {
      val b = feed.poll().get
      TableStream.applyChanges(tgt, "m3", b.changes,
        TableStream.BatchInfo(b.fromVersion, b.toVersion, b.chunk))
      b.ack()
    }
    src.write(batchOf(0 until 3, "hot", 2L), "seq")
    // remaining chunks still read the PINNED snapshot v1 (deterministic
    // chunk domain), then the v2 commit arrives as a changes window
    var windows = 0
    val drained = TableStream.processAvailableNow(src, "m3", Int.MaxValue, 1) {
      (changes, info) =>
        windows += 1
        TableStream.applyChanges(tgt, "m3", changes, info)
    }
    assert(drained == 3, s"2 remaining chunks + 1 incremental window, got $drained")
    mirrorEqualsSource(src, tgt)
    assert(tgt.read.filter(col("hostname") === "hot").count() == 3)
  }

  test("append-only sources stream their appends into a keyed mirror") {
    import spark.implicits._
    val src = IcebergLikeTable(spark,
      Files.createTempDirectory("ts_app_src").toString + "/t", "event", Nil)
    val tgt = keyed("ts_app_tgt")
    src.append((0 until 10).map(i => (s"k$i", "e", "a")).toDF("k", "event", "hostname"))
    assert(TableStream.mirrorInto(src, tgt, "m") == 1)
    src.append((10 until 15).map(i => (s"k$i", "e", "b")).toDF("k", "event", "hostname"))
    assert(TableStream.mirrorInto(src, tgt, "m") == 1)
    mirrorEqualsSource(src, tgt)
    assert(tgt.read.count() == 15)
  }
}
