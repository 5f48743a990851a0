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

  test("upsert rewrite unit: untouched (event,bucket) leaves stay byte-identical") {
    import spark.implicits._
    // the 100 TB contract: a micro-batch touching one key must rewrite
    // only the gbucket leaves containing that key's hash — every other
    // leaf's file list (names, lengths, mtimes) must be unchanged.
    val dir = Files.createTempDirectory("ice-bucket").toString
    val path = s"$dir/t"
    val table = IcebergLikeTable(spark, path, "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 8)
    val base = (0 until 200).map(i =>
      (s"u$i", f"2024-03-05T06:${i % 60}%02d:00Z", if (i % 2 == 0) "view" else "click", "orig"))
      .toDF("user_id", "timestamp", "event", "hostname")
      .withColumn("seq", lit(1L))
    table.write(base, "seq")

    def leafFiles(): Map[String, Set[(String, Long, Long)]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .groupBy(_.getParentFile.toString.stripPrefix(path).stripPrefix("/"))
        .map { case (leaf, fs) =>
          leaf -> fs.map(f => (f.getName, f.length(), f.lastModified())).toSet
        }
    }
    val before = leafFiles()
    assert(before.size > 2, s"expected several leaves, got ${before.keySet}")

    val update = Seq(("u7", "2024-03-05T06:07:00Z", "click", "updated"))
      .toDF("user_id", "timestamp", "event", "hostname")
      .withColumn("seq", lit(2L))
    table.write(update, "seq")
    val after = leafFiles()

    val changed = before.keySet.filter(k => after.get(k) != Some(before(k)))
    assert(changed.size == 1, s"exactly one leaf may be rewritten, got $changed")
    assert(changed.head.startsWith("event=click/gbucket="),
      s"the rewritten leaf must be u7's (event,bucket): $changed")
    // and the merge itself is still correct
    val hosts = table.read.filter($"user_id" === "u7")
      .select("hostname").collect().map(_.getString(0)).toSeq
    assert(hosts == Seq("updated"))
    assert(table.read.count() == 200)
  }

  test("manifest-resolved reads keep partition pruning and filter pushdown") {
    import spark.implicits._
    // the snapshot reader hands Spark an explicit file list (not a
    // directory); the 100 TB contract is that partition pruning on the
    // layout columns and parquet filter pushdown on data columns both
    // still reach the scan — otherwise every leaf of a huge table would
    // be read for a one-leaf query.
    val dir = Files.createTempDirectory("ice-prune").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4)
    val base = (0 until 100).map(i =>
      (s"u$i", f"2024-03-05T06:${i % 60}%02d:00Z", if (i % 2 == 0) "view" else "click", "h"))
      .toDF("user_id", "timestamp", "event", "hostname")
      .withColumn("seq", lit(1L))
    table.write(base, "seq")

    val pruned = table.read.filter($"event" === "view" && $"user_id" === "u8")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event[^\\]]*\\].*"),
      s"event must prune partitions in the manifest read:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*user_id[^\\]]*\\].*"),
      s"user_id must push to parquet:\n$plan")
    // and the pruning actually cuts the scanned file set
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    val all = table.read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount < all.selectedPartitions.partitionCount,
      s"pruned scan must touch fewer leaves: ${scan.selectedPartitions.partitionCount}")
  }

  test("out-of-order replay: an older batch cannot clobber newer rows") {
    import spark.implicits._
    // batch-major `_seq` struct ordering: a stale replay (lower batch id)
    // of a key already committed by a newer batch must lose the merge.
    val dir = Files.createTempDirectory("ice-stale").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"))
    def batchDf(batchId: Long, host: String) =
      Seq(("u1", "2024-03-05T06:00:00Z", "view", host))
        .toDF("user_id", "timestamp", "event", "hostname")
        .withColumn("_seq", struct(
          lit(batchId).as("batch"),
          monotonically_increasing_id().as("mid")))
    table.write(batchDf(1L, "old.example"), "_seq")
    table.write(batchDf(2L, "new.example"), "_seq")
    table.write(batchDf(1L, "old.example"), "_seq") // stale replay
    val hosts = table.read.select("hostname").collect().map(_.getString(0))
    assert(hosts.toSeq == Seq("new.example"),
      s"stale replay must not win last-write-wins: ${hosts.toSeq}")
    // equal-seq re-send with corrected content: MERGE semantics — the
    // incoming row must deterministically beat the stored one.
    table.write(batchDf(2L, "corrected.example"), "_seq")
    val after = table.read.select("hostname").collect().map(_.getString(0))
    assert(after.toSeq == Seq("corrected.example"),
      s"incoming must win orderCol ties: ${after.toSeq}")
  }
}
