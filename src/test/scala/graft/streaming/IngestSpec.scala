package graft.streaming

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.weblog.{Generator, Validator}

/** Streaming ingest path (SURVEY.md §3.1) driven synchronously through
  * MemoryStream micro-batches — the offline stand-in for Kinesis (S4).
  */
class IngestSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("stream: two micro-batches route valid/invalid into zones exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hour = LocalDateTime.of(2024, 3, 3, 8, 0)
    val raw = tmpDir("s-raw")
    val err = tmpDir("s-err")
    val ckpt = tmpDir("s-ckpt")

    val source = MemoryStream[String]
    val stream = source.toDF()
      .withColumnRenamed("value", "payload")
      .withColumn("ingest_ts", lit("2024-03-03 08:00:00").cast("timestamp"))

    val q = Ingest.start(stream, raw, err, ckpt, triggerSeconds = 1)

    val batch1 = (0L until 50L).map(i => Generator.payload(11, i, hour))
    val batch2 = (50L until 80L).map(i => Generator.payload(11, i, hour)) :+
      """{"user_id": "x", "timestamp": "not-a-ts"}"""
    source.addData(batch1: _*)
    q.processAllAvailable()
    source.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val rawOut = spark.read.text(raw)
    assert(rawOut.count() == 80)
    val errOut = spark.read.json(err)
    assert(errOut.count() == 1)
  }

  test("availableNow backfill drains the source, stops, and resumes without duplicates") {
    import spark.implicits._

    val hour = LocalDateTime.of(2024, 3, 3, 9, 0)
    val drop = tmpDir("b-drop")
    val raw = tmpDir("b-raw")
    val err = tmpDir("b-err")
    val ckpt = tmpDir("b-ckpt")

    def dropFile(name: String, ids: Range): Unit = {
      val lines = ids.map(i => Generator.payload(12, i.toLong, hour)).mkString("\n")
      Files.writeString(java.nio.file.Paths.get(s"$drop/$name"), lines)
    }
    def fileStream = spark.readStream.text(drop)
      .withColumnRenamed("value", "payload")
      .withColumn("ingest_ts", lit("2024-03-03 09:00:00").cast("timestamp"))

    dropFile("a.jsonl", 0 until 40)
    val q1 = Ingest.start(fileStream, raw, err, ckpt, availableNow = true)
    q1.awaitTermination() // AvailableNow terminates after draining
    assert(spark.read.text(raw).count() == 40)

    dropFile("b.jsonl", 40 until 70)
    val q2 = Ingest.start(fileStream, raw, err, ckpt, availableNow = true)
    q2.awaitTermination()
    // the second catch-up run processes ONLY the new file (checkpointed
    // source offsets), so nothing is duplicated
    assert(spark.read.text(raw).count() == 70)
    assert(spark.read.text(raw).distinct().count() == 70)
  }

  test("event-time hourly window aggregation over the parsed stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val source = MemoryStream[String]
    val typed = Validator.parsed(
      Validator.validate(source.toDF().withColumnRenamed("value", "payload"), "payload", "B")
        .filter(col("valid")), "payload", "B")

    val agg = Ingest.hourlyEventCounts(typed)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()

    val h1 = LocalDateTime.of(2024, 3, 3, 9, 0)
    val h2 = LocalDateTime.of(2024, 3, 3, 10, 0)
    source.addData((0L until 40L).map(i => Generator.payload(5, i, h1)): _*)
    source.addData((40L until 60L).map(i => Generator.payload(5, i, h2)): _*)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly_out")
    val perHour = out.groupBy("hour_start").agg(sum("cnt").as("n"))
      .orderBy("hour_start").collect()
    assert(perHour.length == 2)
    assert(perHour.map(_.getLong(1)).sum == 60)
  }

  test("session windows on the stream close after the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val source = MemoryStream[String]
    val typed = Validator.parsed(
      Validator.validate(source.toDF().withColumnRenamed("value", "payload"), "payload", "B")
        .filter(col("valid")), "payload", "B")
    val q = Ingest.sessionWindows(typed)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()

    // one user, two bursts >30min apart within one hour
    def rec(min: Int, sec: Int) =
      s"""{"user_id": "u1", "session_id": "s", "event": "view", "ip": "1.1.1.1",
         | "hostname": "h", "os": "l", "timestamp": "2024-03-03T09:${f"$min%02d"}:${f"$sec%02d"}Z",
         | "uri": "https://x"}""".stripMargin.replace("\n", "")
    source.addData(rec(0, 0), rec(1, 0), rec(2, 0), rec(45, 0), rec(46, 30))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out").orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getLong(3) == 3 && out(1).getLong(3) == 2)
  }

  test("observe surfaces T4 validation counters per batch") {
    import graft.weblog.Generator
    val hour = java.time.LocalDateTime.of(2024, 3, 4, 7, 0)
    val df = Generator.frame(spark, 60, seed = 3, hour, invalidEvery = 20)
    val observed = Validator.observed(Validator.validate(df, "payload", "B"))
    observed.collect() // trigger this exact QueryExecution
    val metrics = observed.queryExecution.observedMetrics("validation")
    assert(metrics.getLong(0) == 60)
    assert(metrics.getLong(1) == 57)
    assert(metrics.getLong(2) == 3)
  }
}
