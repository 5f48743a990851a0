package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pull-based CDC consumption with consumer-committed cursors:
  * at-least-once delivery, re-delivery without ack, independent
  * consumers, initial load, and append-only sources.
  */
class ChangeFeedSpec extends SparkTestBase {

  private def keyedTable(): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory("feed_src").toString + "/t",
      "event", Seq("k"))

  private def batchOf(ids: Range, v: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", v, v)).toDF("k", "event", "value", "seq")
  }

  test("poll delivers since cursor; ack advances; no ack re-delivers") {
    val t = keyedTable()
    val feed = ChangeFeed(t, "primary")
    assert(feed.poll().isEmpty) // empty table

    t.write(batchOf(0 until 10, 1L), "seq")
    val b1 = feed.poll().get
    // initial load: the whole table as inserts
    assert(b1.changes.filter(col("_change_type") === "insert").count() == 10)
    // not acked yet: a second poll re-delivers the same window
    val again = feed.poll().get
    assert(again.fromVersion == b1.fromVersion && again.toVersion == b1.toVersion)
    b1.ack()
    assert(feed.cursor == b1.toVersion)
    assert(feed.poll().isEmpty) // fully caught up

    // an update commit: pre+post images for the changed keys only
    t.write(batchOf(0 until 3, 2L), "seq")
    val b2 = feed.poll().get
    assert(b2.fromVersion == b1.toVersion)
    assert(b2.changes.filter(col("_change_type") === "update_postimage")
      .count() == 3)
    assert(b2.changes.filter(col("_change_type") === "update_preimage")
      .count() == 3)
    b2.ack()

    // a delete commit: deletes only
    t.delete(col("k") === "k5")
    val b3 = feed.poll().get
    assert(b3.changes.filter(col("_change_type") === "delete").count() == 1)
    assert(b3.changes.count() == 1)
    b3.ack()
    assert(feed.poll().isEmpty)
  }

  test("independent consumers keep independent cursors") {
    val t = keyedTable()
    t.write(batchOf(0 until 5, 1L), "seq")
    val fast = ChangeFeed(t, "fast")
    val slow = ChangeFeed(t, "slow")
    fast.poll().get.ack()
    t.write(batchOf(5 until 8, 2L), "seq")
    // fast sees only the new window; slow still sees everything
    assert(fast.poll().get.changes.count() == 3)
    assert(slow.poll().get.changes.count() == 8)
  }

  test("a readable cursor survives every commit crash point") {
    val t = keyedTable()
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(t.path)
    val feed = ChangeFeed(t, "crashy")
    t.write(batchOf(0 until 4, 1L), "seq")
    feed.poll().get.ack()
    val v1 = feed.cursor
    assert(v1 > 0L)
    // simulate a crash between publishing the new cursor file and
    // sweeping the old one: both versioned files on disk — the cursor
    // must read the max, and a re-ack must clean up the leftover
    val leftover = new org.apache.hadoop.fs.Path(root, s".graft_feed_crashy_v${v1 - 1}")
    fs.create(leftover, true).close()
    assert(feed.cursor == v1, "max of the versioned cursor files wins")
    t.write(batchOf(0 until 2, 2L), "seq")
    val b = feed.poll().get
    assert(b.fromVersion == v1)
    b.ack()
    assert(feed.cursor == b.toVersion)
    // commit swept every older cursor file
    val cursorFiles = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(".graft_feed_crashy_v"))
    assert(cursorFiles.toSeq == Seq(s".graft_feed_crashy_v${b.toVersion}"))
  }

  test("legacy content-based cursor files migrate without re-delivery") {
    val t = keyedTable()
    t.write(batchOf(0 until 10, 1L), "seq") // v1
    t.write(batchOf(0 until 3, 2L), "seq")  // v2
    val root = new org.apache.hadoop.fs.Path(t.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a cursor from the previous release: version IN the file content
    val legacy = new org.apache.hadoop.fs.Path(root, ".graft_feed_old")
    val out = fs.create(legacy, true)
    out.write("1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val feed = ChangeFeed(t, "old")
    assert(feed.cursor == 1L,
      "an upgraded feed must resume from the legacy cursor, not version 0")
    val b = feed.poll().get
    assert(b.fromVersion == 1L && b.toVersion == 2L)
    assert(b.changes.filter(col("_change_type") === "update_postimage")
      .count() == 3, "no full-table re-delivery on upgrade")
    b.ack()
    assert(!fs.exists(legacy),
      "the legacy cursor is retired once a versioned cursor is durable")
    assert(feed.cursor == 2L)
  }

  test("append-only tables feed their appended rows") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("feed_app").toString + "/t", "event", Nil)
    val feed = ChangeFeed(t, "app")
    t.append(Seq((1L, "e")).toDF("n", "event"))
    feed.poll().get.ack()
    t.append(Seq((2L, "e"), (3L, "e")).toDF("n", "event"))
    val b = feed.poll().get
    assert(b.changes.count() == 2)
    assert(b.changes.filter(col("_change_type") === "insert").count() == 2)
    b.ack()
    assert(feed.poll().isEmpty)
  }
}
