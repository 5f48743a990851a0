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
}
