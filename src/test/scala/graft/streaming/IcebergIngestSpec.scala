package graft.streaming

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.weblog.{Generator, IcebergLikeTable}

/** §3.4 streaming lifecycle: stream → validate → Iceberg-like table with
  * upsert routing; replaying a batch (at-least-once delivery) must not
  * duplicate rows when unique keys are declared.
  */
class IcebergIngestSpec extends SparkTestBase {

  test("streaming upsert ingest: duplicates across batches collapse on keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("ice-stream").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"))
    val hour = LocalDateTime.of(2024, 3, 5, 6, 0)

    val source = MemoryStream[String]
    val stream = source.toDF()
      .withColumnRenamed("value", "payload")
      .withColumn("ingest_ts", lit("2024-03-05 06:00:00").cast("timestamp"))
    val q = Ingest.startIcebergIngest(stream, table, s"$dir/err", s"$dir/ckpt",
      triggerSeconds = 1)

    val batch = (0L until 40L).map(i => Generator.payload(21, i, hour))
    source.addData(batch: _*)
    q.processAllAvailable()
    // at-least-once replay of the same payloads (new micro-batch)
    source.addData(batch: _*)
    q.processAllAvailable()
    q.stop()

    val rows = table.read
    assert(rows.count() == 40, "replayed batch must upsert, not append")
    assert(rows.select("user_id", "timestamp").distinct().count() == 40)
    // partitioned by event on disk
    val parts = new java.io.File(s"$dir/t").listFiles().map(_.getName)
      .filter(_.startsWith("event="))
    assert(parts.nonEmpty)
  }
}
