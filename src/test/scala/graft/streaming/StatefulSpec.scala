package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.weblog.Validator

/** Custom stateful ops on the stream: flatMapGroupsWithState
  * sessionization and dropDuplicatesWithinWatermark.
  */
class StatefulSpec extends SparkTestBase {

  private def rec(user: String, hhmmss: String) =
    s"""{"user_id": "$user", "session_id": "s", "event": "view", "ip": "1.1.1.1",
       | "hostname": "h", "os": "l", "timestamp": "2024-03-07T${hhmmss}Z",
       | "uri": "https://x"}""".stripMargin.replace("\n", "")

  private def typedStream(source: MemoryStream[String]) =
    Validator.parsed(
      Validator.validate(source.toDF().withColumnRenamed("value", "payload"), "payload", "B")
        .filter(col("valid")), "payload", "B")

  test("flatMapGroupsWithState closes sessions on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val sessions = StatefulSessionizer.closedSessions(typedStream(source),
      gapSeconds = 1800, watermark = "10 minutes")
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("closed_sessions").start()

    // burst 1 (3 events), then a later burst that closes it via gap
    source.addData(rec("u1", "08:00:00"), rec("u1", "08:01:00"), rec("u1", "08:02:00"))
    q.processAllAvailable()
    source.addData(rec("u1", "09:30:00"), rec("u1", "09:31:00"))
    q.processAllAvailable()
    // advance the watermark far past burst 2's timeout so it closes too
    source.addData(rec("u2", "12:00:00"))
    q.processAllAvailable()
    source.addData(rec("u2", "12:00:30"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("closed_sessions")
      .select("user_id", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.contains(("u1", 3L)), s"gap-closed session missing: $out")
    assert(out.contains(("u1", 2L)), s"timeout-closed session missing: $out")
  }

  test("sessionizer runs on the RocksDB state store with identical results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateStores.useRocksDB(spark)
    try {
      val source = MemoryStream[String]
      val sessions = StatefulSessionizer.closedSessions(typedStream(source),
        gapSeconds = 1800, watermark = "10 minutes")
      val q = sessions.toDF().writeStream.outputMode("append")
        .format("memory").queryName("rocksdb_sessions").start()
      source.addData(rec("u1", "08:00:00"), rec("u1", "08:01:00"), rec("u1", "08:02:00"))
      q.processAllAvailable()
      source.addData(rec("u1", "09:30:00"))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("rocksdb_sessions")
        .select("user_id", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(out == Set(("u1", 3L)), s"gap-closed session under RocksDB: $out")
    } finally StateStores.useDefault(spark)
  }

  private def recEv(user: String, event: String, hhmmss: String) =
    s"""{"user_id": "$user", "session_id": "s", "event": "$event", "ip": "1.1.1.1",
       | "hostname": "h", "os": "l", "timestamp": "2024-03-07T${hhmmss}Z",
       | "uri": "https://x"}""".stripMargin.replace("\n", "")

  test("streaming funnel emits one completion at the strict-order unlock, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val done = StatefulFunnel.completions(typedStream(source),
      Seq("view", "click", "purchase"))
    val q = done.toDF().writeStream.outputMode("append")
      .format("memory").queryName("funnel_done").start()

    // u1: view+click in batch 1 (no completion yet), purchase in batch 2
    // u2: purchase BEFORE any view/click → never completes
    // u3: click before view, then purchase → click doesn't count → no completion
    source.addData(
      recEv("u1", "view", "08:00:00"), recEv("u1", "click", "08:05:00"),
      recEv("u2", "purchase", "08:00:00"),
      recEv("u3", "click", "08:00:00"), recEv("u3", "view", "08:10:00"))
    q.processAllAvailable()
    assert(spark.table("funnel_done").count() == 0)
    source.addData(
      recEv("u1", "purchase", "08:30:00"),
      recEv("u3", "purchase", "08:30:00"))
    q.processAllAvailable()
    // a second full pass for u1 must NOT re-emit (tombstone)
    source.addData(
      recEv("u1", "view", "09:00:00"), recEv("u1", "click", "09:05:00"),
      recEv("u1", "purchase", "09:10:00"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_done").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("u1"), rows.mkString(";"))
    val times = rows(0).getSeq[java.sql.Timestamp](1).map(_.getTime)
    val base = java.time.Instant.parse("2024-03-07T08:00:00Z").toEpochMilli
    assert(times == Seq(base, base + 5 * 60000L, base + 30 * 60000L),
      times.mkString(","))
  }

  test("funnel state expires on the retention TTL; replayed old events cannot re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    // short horizon so the test can cross it: 10 min watermark, 1 h TTL
    val done = StatefulFunnel.completions(typedStream(source),
      Seq("view", "click", "purchase"),
      watermark = "10 minutes", retention = "1 hour")
    val q = done.toDF().writeStream.outputMode("append")
      .format("memory").queryName("funnel_ttl").start()

    // u1 completes at 08:00/08:05/08:10 → one emission, then a tombstone
    val original = Seq(
      recEv("u1", "view", "08:00:00"), recEv("u1", "click", "08:05:00"),
      recEv("u1", "purchase", "08:10:00"))
    source.addData(original: _*)
    q.processAllAvailable()
    assert(spark.table("funnel_ttl").count() == 1)

    // advance the watermark far past 08:10 + 1h: the tombstone (and any
    // in-progress state) must expire via the event-time timeout
    source.addData(recEv("u9", "view", "12:00:00"))
    q.processAllAvailable()
    source.addData(recEv("u9", "view", "12:30:00"))
    q.processAllAvailable()

    // at-least-once replay of u1's ORIGINAL events, long after expiry:
    // they are older than the watermark, so the late-event filter drops
    // them before the operator — no state rebuild, no re-emission.
    source.addData(original: _*)
    q.processAllAvailable()
    assert(spark.table("funnel_ttl").count() == 1,
      "expired tombstone + late replay must not re-emit")

    // a genuinely NEW post-expiry completion (fresh event times) emits
    // again — proof the state entry was really removed, and the
    // documented retention/exactness trade.
    source.addData(
      recEv("u1", "view", "12:40:00"), recEv("u1", "click", "12:45:00"),
      recEv("u1", "purchase", "12:50:00"))
    q.processAllAvailable()
    q.stop()
    val users = spark.table("funnel_ttl").collect().map(_.getString(0)).toSeq
    assert(users == Seq("u1", "u1"), s"post-expiry fresh completion must emit: $users")
  }

  private def recDay(user: String, date: String, hhmmss: String) =
    s"""{"user_id": "$user", "session_id": "s", "event": "view", "ip": "1.1.1.1",
       | "hostname": "h", "os": "l", "timestamp": "${date}T${hhmmss}Z",
       | "uri": "https://x"}""".stripMargin.replace("\n", "")

  test("streaming dau dedups (user, day) across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val q = Ingest.streamingDau(typedStream(source))
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_dau").start()
    source.addData(
      recDay("u1", "2024-03-07", "08:00:00"),
      recDay("u1", "2024-03-07", "09:00:00"))
    q.processAllAvailable()
    source.addData(
      recDay("u1", "2024-03-07", "20:00:00"), // same user+day, 12h later
      recDay("u2", "2024-03-07", "21:00:00"),
      recDay("u1", "2024-03-08", "08:00:00"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_dau").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out == Map("2024-03-07" -> 2L, "2024-03-08" -> 1L), out.toString)
  }

  test("dropDuplicatesWithinWatermark collapses replayed keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val deduped = Ingest.dedupWithinWatermark(typedStream(source),
      Seq("user_id", "timestamp"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    val batch = Seq(rec("u1", "08:00:00"), rec("u1", "08:00:10"), rec("u2", "08:00:20"))
    source.addData(batch: _*)
    q.processAllAvailable()
    source.addData(batch: _*) // exact replay inside the watermark
    q.processAllAvailable()
    q.stop()

    assert(spark.table("dedup_out").count() == 3)
  }
}
