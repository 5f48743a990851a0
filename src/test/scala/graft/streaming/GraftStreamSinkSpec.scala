package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.weblog.IcebergLikeTable

/** `writeStream.format("graft")` — the table as a Structured Streaming
  * SINK: append / order-aware upsert per trigger with the table's
  * exactly-once batch-id mark, and `cdc=true` turning a graft→graft
  * stream into a crash-safe table mirror through the standard engine.
  */
class GraftStreamSinkSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  test("append-only sink lands rows; a replayed batch id is a clean skip") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = tmp("gsk_app") + "/t"
    val cp = tmp("gsk_app_cp")
    val source = MemoryStream[(String, String)]
    source.addData(("k1", "e"), ("k2", "e"))
    val q = source.toDF().toDF("k", "event").writeStream
      .format("graft").option("path", root)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val t = IcebergLikeTable(spark, root)
    assert(t.read.count() == 2)

    // replay: same streamId + batchId (crash after commit, before the
    // engine checkpoint advanced) must not duplicate
    t.append(Seq(("k1", "e"), ("k2", "e")).toDF("k", "event"), Some((cp, 0L)))
    assert(t.read.count() == 2, "replayed batch id was not skipped")

    // next trigger appends the NEW window only
    source.addData(("k3", "e"))
    val q2 = source.toDF().toDF("k", "event").writeStream
      .format("graft").option("path", root)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(t.read.count() == 3)
  }

  test("keyed sink upserts with last-write-wins on orderCol") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = tmp("gsk_up") + "/t"
    val cp = tmp("gsk_up_cp")
    val source = MemoryStream[(String, String, String, Long)]
    def run(): Unit = {
      val q = source.toDF().toDF("k", "event", "hostname", "seq").writeStream
        .format("graft").option("path", root)
        .option("uniqueKeys", "k").option("numBuckets", "4")
        .option("orderCol", "seq")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    source.addData(("k1", "e", "orig", 2L), ("k2", "e", "orig", 2L))
    run()
    // an OLDER row for k1 must lose; a newer row for k2 must win
    source.addData(("k1", "e", "stale", 1L), ("k2", "e", "fresh", 3L))
    run()
    val t = IcebergLikeTable(spark, root, "event", Seq("k"), numBuckets = 4)
    val hosts = t.read.select("k", "hostname").as[(String, String)]
      .collect().toMap
    assert(hosts == Map("k1" -> "orig", "k2" -> "fresh"))
  }

  test("cdc sink mirrors a table end to end, deletes included") {
    import spark.implicits._
    val srcRoot = tmp("gsk_cdc_src") + "/t"
    val tgtRoot = tmp("gsk_cdc_tgt") + "/t"
    val cp = tmp("gsk_cdc_cp")
    val src = IcebergLikeTable(spark, srcRoot, "event", Seq("k"), numBuckets = 4)

    def mirror(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", srcRoot)
        .option("uniqueKeys", "k").option("numBuckets", "4")
        .load()
        .writeStream.format("graft")
        .option("path", tgtRoot)
        .option("uniqueKeys", "k").option("numBuckets", "4")
        .option("orderCol", "_commit_version")
        .option("cdc", "true")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sameRows(a: DataFrame, b: DataFrame): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)

    val tgt = IcebergLikeTable(spark, tgtRoot, "event", Seq("k"), numBuckets = 4)

    // initial load
    src.write((0 until 20).map(i => (s"k$i", "e", "orig", 1L))
      .toDF("k", "event", "hostname", "seq"), "seq")
    mirror()
    sameRows(tgt.read.drop("_commit_version"), src.read)

    // incremental: update + row-level delete in the next windows
    src.write((0 until 4).map(i => (s"k$i", "e", "gen2", 2L))
      .toDF("k", "event", "hostname", "seq"), "seq")
    src.delete(col("k").isin("k7", "k8"))
    mirror()
    sameRows(tgt.read.drop("_commit_version"), src.read)
    assert(tgt.read.count() == 18)
    assert(tgt.read.filter($"hostname" === "gen2").count() == 4)

    // caught up: no new commits → no new target version
    val v = tgt.currentVersion.get
    mirror()
    assert(tgt.currentVersion.contains(v),
      "an empty window must not commit a new snapshot")
  }
}
