package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkTestBase

/** Incremental/CDC reads over the snapshot-commit table
  * (`IcebergLikeTable.changesBetween` / `appendsBetween`): the changelog
  * between two retained versions must contain exactly the net row
  * changes — updates as pre/post pairs, carried-through rewrite rows
  * suppressed — and must read only the leaves whose file set changed.
  */
class IcebergCdcSpec extends SparkTestBase {

  import spark.implicits._

  private def freshTable(keys: Seq[String] = Seq("user_id", "timestamp")) = {
    val dir = Files.createTempDirectory("ice-cdc").toString
    IcebergLikeTable(spark, s"$dir/t", "event", uniqueKeys = keys, numBuckets = 4)
  }

  private def rows(n: Int, host: String, event: String = "view", prefix: String = "u") =
    (0 until n).map(i =>
      (s"$prefix$i", f"2024-03-05T06:${i % 60}%02d:${i / 60}%02dZ", event, host, 1L))
      .toDF("user_id", "timestamp", "event", "hostname", "seq")

  test("changelog: update pre/post pairs, inserts, carried rows suppressed") {
    val t = freshTable()
    t.write(rows(10, "orig"), "seq")
    val v1 = t.currentVersion.get
    // update u0..u2, insert u90..u91; u3..u9 share rewritten leaves but
    // carry through value-identical and MUST NOT appear in the changelog
    val batch =
      rows(3, "upd").withColumn("seq", lit(2L))
        .unionByName(Seq(
          ("u90", "2024-03-05T07:00:00Z", "view", "new", 1L),
          ("u91", "2024-03-05T07:01:00Z", "view", "new", 1L))
          .toDF("user_id", "timestamp", "event", "hostname", "seq"))
    t.write(batch, "seq")
    val v2 = t.currentVersion.get

    val changes = t.changesBetween(v1, v2)
      .select("_change_type", "user_id", "hostname", "_commit_version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val expected =
      (0 until 3).flatMap(i => Seq(
        ("update_preimage", s"u$i", "orig", v2),
        ("update_postimage", s"u$i", "upd", v2))).toSet ++
        Set(("insert", "u90", "new", v2), ("insert", "u91", "new", v2))
    assert(changes === expected)
  }

  test("changelog: row-level delete emits delete rows only") {
    val t = freshTable()
    t.write(rows(6, "h", "view").unionByName(rows(4, "h", "click", prefix = "c")), "seq")
    val v1 = t.currentVersion.get
    assert(t.delete(col("event") === "click") === 4L)
    val v2 = t.currentVersion.get
    val changes = t.changesBetween(v1, v2)
    assert(changes.groupBy("_change_type").count().collect().toSeq ===
      Seq(Row("delete", 4L)))
    assert(changes.select("event").distinct().collect() === Array(Row("click")))
  }

  test("identical re-send and maintain() rewrite contribute zero change rows") {
    val t = freshTable()
    // multi-task staging → several files per (event, bucket) leaf; AQE
    // would coalesce this tiny shuffle to one task (one file per leaf),
    // so pin it off for the write
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t.write(rows(32, "h").repartition(8), "seq")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val v1 = t.currentVersion.get
    // identical re-send (same key, value, AND seq): the merge rewrites
    // the touched leaf, but no row changes value — changelog empty
    t.write(rows(1, "h"), "seq")
    val v2 = t.currentVersion.get
    assert(t.changesBetween(v1, v2).count() === 0L)
    // small-file compaction rewrites leaves without changing rows
    assert(t.maintain(fileThreshold = 1).nonEmpty, "maintain must rewrite")
    val v3 = t.currentVersion.get
    assert(t.changesBetween(v2, v3).count() === 0L)
  }

  test("changelog only reads leaves whose file set changed") {
    val t = freshTable()
    t.write(rows(64, "orig"), "seq")
    val v1 = t.currentVersion.get
    t.write(rows(1, "upd").withColumn("seq", lit(2L)), "seq")
    val v2 = t.currentVersion.get
    val scanned = t.changesBetween(v1, v2).queryExecution.executedPlan
      .collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    val live = Manifests.resolve(
      new org.apache.hadoop.fs.Path(t.path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(t.path)).get._2.size
    assert(scanned < live,
      s"diff must not read the whole table: scanned $scanned of $live live files")
  }

  test("add-column evolution: preimage reads null for the new column") {
    val t = freshTable()
    t.write(rows(2, "orig"), "seq")
    val v1 = t.currentVersion.get
    t.write(rows(1, "upd").withColumn("seq", lit(2L))
      .withColumn("country", lit("DE")), "seq")
    val v2 = t.currentVersion.get
    val byType = t.changesBetween(v1, v2)
      .select("_change_type", "user_id", "country")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(byType === Set(
      ("update_preimage", "u0", None),
      ("update_postimage", "u0", Some("DE"))))
  }

  test("appendsBetween: exact new rows for append-only tables; rewrites refuse") {
    val t = freshTable(keys = Nil)
    t.append(rows(3, "a"))
    val v1 = t.currentVersion.get
    t.append(rows(2, "b").withColumn("user_id", concat(lit("x"), col("user_id"))))
    val v2 = t.currentVersion.get
    val added = t.appendsBetween(v1, v2)
    assert(added.count() === 2L)
    assert(added.select("hostname").distinct().collect() === Array(Row("b")))
    assert(added.select("_commit_version").distinct().collect() === Array(Row(v2)))

    val keyed = freshTable()
    keyed.write(rows(4, "h"), "seq")
    val kv1 = keyed.currentVersion.get
    keyed.write(rows(1, "h2").withColumn("seq", lit(2L)), "seq")
    val kv2 = keyed.currentVersion.get
    intercept[IllegalArgumentException](keyed.appendsBetween(kv1, kv2))
  }

  test("streaming micro-batch commits produce a consumable changelog") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ice-cdc-stream").toString
    val t = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4)
    val hour = java.time.LocalDateTime.of(2024, 3, 5, 6, 0)
    val source = MemoryStream[String]
    val stream = source.toDF().withColumnRenamed("value", "payload")
      .withColumn("ingest_ts", lit("2024-03-05 06:00:00").cast("timestamp"))
    val q = graft.streaming.Ingest.startIcebergIngest(
      stream, t, s"$dir/err", s"$dir/ckpt", triggerSeconds = 1)
    source.addData((0L until 20L).map(i => Generator.payload(7, i, hour)): _*)
    q.processAllAvailable()
    val v1 = t.currentVersion.get
    // second micro-batch: 10 at-least-once replays + 10 new records
    source.addData((10L until 30L).map(i => Generator.payload(7, i, hour)): _*)
    q.processAllAvailable()
    q.stop()
    val v2 = t.currentVersion.get

    val changes = t.changesBetween(v1, v2)
    val byType = changes.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") === 10L)
    // a replayed record wins the merge tie and refreshes its _seq — the
    // stored row really did change, so CDC surfaces an update pair...
    assert(byType.getOrElse("update_preimage", 0L) ===
      byType.getOrElse("update_postimage", 0L))
    // ...whose user-visible columns are identical (only _seq moved)
    val visible = changes.filter(col("_change_type").startsWith("update"))
      .drop("_seq", "_commit_version")
      .groupBy(changes.columns.filterNot(c =>
        c == "_seq" || c == "_commit_version" || c == "_change_type").map(col): _*)
      .agg(count(lit(1)).as("n"))
    assert(visible.filter(col("n") =!= 2).count() === 0,
      "every update pre/post pair must agree on user-visible columns")
  }

  test("applying the changelog to a snapshot reconstructs the next snapshot") {
    // the CDC contract, model-based: for every consecutive version pair
    // across a mixed history (upserts, inserts, a delete, a compaction),
    // state(v_{i+1}) == state(v_i) − (deleted ∪ update keys) ∪
    // (inserts ∪ update postimages), as exact multisets.
    val t = freshTable()
    t.write(rows(24, "h0"), "seq")
    t.write(rows(6, "h1").withColumn("seq", lit(2L))
      .unionByName(rows(5, "h1", prefix = "n")), "seq")
    t.delete(col("user_id").startsWith("n"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t.write(rows(4, "h2").withColumn("seq", lit(3L)).repartition(8), "seq")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    t.maintain(fileThreshold = 1)
    val vs = t.versions
    assert(vs.size >= 4)
    vs.zip(vs.tail).foreach { case (v1, v2) =>
      val before = t.readAt(v1)
      val after = t.readAt(v2)
      val ch = t.changesBetween(v1, v2).cache()
      val keys = Seq("user_id", "timestamp")
      val removedKeys = ch
        .filter(col("_change_type").isin("delete", "update_preimage"))
        .select(keys.map(col): _*)
      val added = ch
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(before.columns.map(col): _*)
      val rebuilt = before.join(removedKeys, keys, "left_anti")
        .unionByName(added)
      assert(rebuilt.exceptAll(after).count() === 0 &&
        after.exceptAll(rebuilt).count() === 0,
        s"changelog v$v1→v$v2 must reconstruct the snapshot")
      ch.unpersist()
    }
  }

  test("rollback commits the historical file set; CDC shows the inverse") {
    val t = freshTable()
    t.write(rows(12, "good"), "seq")
    val v1 = t.currentVersion.get
    t.write(rows(4, "bad").withColumn("seq", lit(2L))
      .unionByName(rows(3, "bad", prefix = "x")), "seq")
    val v2 = t.currentVersion.get
    val v3 = t.rollbackTo(v1)
    assert(t.currentVersion.get === v3)
    // live state is exactly the v1 snapshot again (no file was rewritten)
    assert(t.read.exceptAll(t.readAt(v1)).count() === 0 &&
      t.readAt(v1).exceptAll(t.read).count() === 0)
    // the bad version stays readable until retention expires it
    assert(t.readAt(v2).filter(col("hostname") === "bad").count() === 7L)
    // the rollback's changelog is the inverse of the bad commit's:
    // updates swap pre/post images, the bad inserts become deletes
    val undo = t.changesBetween(v2, v3)
      .groupBy("_change_type", "hostname").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(undo(("update_preimage", "bad")) === 4L)
    assert(undo(("update_postimage", "good")) === 4L)
    assert(undo(("delete", "bad")) === 3L)
    assert(!undo.keys.exists(_._1 == "insert"))
  }

  test("expired or unknown versions fail loudly") {
    val t = freshTable()
    t.write(rows(2, "h"), "seq")
    val v = t.currentVersion.get
    intercept[NoSuchElementException](t.changesBetween(v - 999, v))
  }
}
