package graft.weblog

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end slice (SURVEY.md §7.2): gen → validate → raw zone →
  * compaction → parquet zone → SQL over cataloged tables; plus the
  * multiset-preservation property and the upsert fixtures (FIXTURES.md §2).
  */
class PipelineSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("e2e: generate -> validate -> raw zone -> compact -> query counts match") {
    val hour = LocalDateTime.of(2024, 3, 1, 10, 0)
    val raw = tmpDir("rawzone")
    val err = tmpDir("errzone")
    val pq = tmpDir("pqzone")

    val n = 500L
    val df = Generator.frame(spark, n, seed = 42, hour, invalidEvery = 25)
    val validated = Validator.validate(df, "payload", "B")
    val (ok, bad) = Validator.route(validated)
    Zones.writeRawJson(ok, raw)
    Zones.writeErrors(bad, err)

    val hp = Compaction.HourPartition.of(hour)
    // trigger fires in hour H+1, compacting H (athena_ctas.py:141-143)
    val written = Compaction.compactHour(spark, raw, pq, hp)
    assert(written == n - n / 25)

    // catalog + SQL surface (Q1/Q2 semantics)
    val db = "weblogdb"
    WebLogCatalog.createDatabase(spark, db)
    WebLogCatalog.dropTableIfExists(spark, s"$db.web_log_json")
    WebLogCatalog.dropTableIfExists(spark, s"$db.web_log_parquet")
    WebLogCatalog.createRawJsonTable(spark, s"$db.web_log_json", raw)
    WebLogCatalog.createParquetTable(spark, s"$db.web_log_parquet", pq)
    WebLogCatalog.msckRepair(spark, s"$db.web_log_json")
    WebLogCatalog.addPartition(spark, s"$db.web_log_parquet", hp, s"$pq/${hp.relPath}")

    val cRaw = spark.sql(
      s"SELECT count(*) FROM $db.web_log_json WHERE year=2024 AND month=3 AND day=1 AND hour=10")
      .collect()(0).getLong(0)
    val cPq = spark.sql(s"SELECT count(*) FROM $db.web_log_parquet").collect()(0).getLong(0)
    assert(cRaw == written && cPq == written)
    assert(WebLogCatalog.showPartitions(spark, s"$db.web_log_json").count() == 1)

    // compaction preserves the row multiset (raw EXCEPT ALL compacted empty
    // both ways — SURVEY §5.2 property)
    val rawParsed = Compaction.readRawHour(spark, raw, hp).drop("event_ts")
    val compacted = spark.read.parquet(s"$pq/${hp.relPath}").drop("event_ts")
    assert(rawParsed.exceptAll(compacted).count() == 0)
    assert(compacted.exceptAll(rawParsed).count() == 0)

    // error zone holds exactly the invalid records, tagged by failure type
    val errs = spark.read.json(err)
    assert(errs.count() == n / 25)
    assert(errs.select("error_type").distinct().count() >= 2)
  }

  test("C1 as literal CTAS SQL compacts the pruned hour (athena_ctas.py:30-39 shape)") {
    val hour = LocalDateTime.of(2024, 3, 6, 14, 0)
    val raw = tmpDir("ctas-raw")
    val ext = tmpDir("ctas-ext") + "/out"
    val df = Generator.frame(spark, 120, seed = 4, hour)
    Zones.writeRawJson(Validator.validate(df, "payload", "B").filter(col("valid")), raw)
    // also write a neighboring hour that the CTAS must prune away
    val df2 = Generator.frame(spark, 50, seed = 5, hour.plusHours(1))
    Zones.writeRawJson(Validator.validate(df2, "payload", "B").filter(col("valid")), raw)

    WebLogCatalog.dropTableIfExists(spark, "ctas_src")
    WebLogCatalog.dropTableIfExists(spark, "tmp_ctas_out")
    WebLogCatalog.createRawJsonTable(spark, "ctas_src", raw)
    WebLogCatalog.msckRepair(spark, "ctas_src")
    val hp = Compaction.HourPartition.of(hour)
    WebLogCatalog.ctasCompactHour(spark, "tmp_ctas_out", ext, "ctas_src", hp)
    assert(spark.sql("SELECT count(*) FROM tmp_ctas_out").collect()(0).getLong(0) == 120)
    assert(spark.read.parquet(ext).count() == 120)
    // C3: dropping the tmp table keeps the external data files
    WebLogCatalog.dropTableIfExists(spark, "tmp_ctas_out")
    assert(spark.read.parquet(ext).count() == 120)
  }

  test("compaction re-run of the same hour is idempotent (atomic swap)") {
    val hour = LocalDateTime.of(2024, 3, 2, 5, 0)
    val raw = tmpDir("rawzone2")
    val pq = tmpDir("pqzone2")
    val df = Generator.frame(spark, 200, seed = 1, hour)
    Zones.writeRawJson(Validator.validate(df, "payload", "B").filter(col("valid")), raw)
    val hp = Compaction.HourPartition.of(hour)
    assert(Compaction.compactHour(spark, raw, pq, hp) == 200)
    assert(Compaction.compactHour(spark, raw, pq, hp) == 200)
    assert(spark.read.parquet(s"$pq/${hp.relPath}").count() == 200)

    // small-file merge actually merged: exactly targetFiles=1 data file,
    // visible through the partitionStats monitoring op
    val stats = Zones.partitionStats(spark, pq).collect()
    assert(stats.length == 1 && stats(0).getLong(1) == 1,
      s"expected 1 partition with 1 file: ${stats.mkString}")
    val rawStats = Zones.partitionStats(spark, raw)
    assert(rawStats.count() >= 1)
  }

  test("hourly lifecycle: 3 ingest hours, Compaction.run per trigger, ±1h registration") {
    val raw = tmpDir("life-raw")
    val pq = tmpDir("life-pq")
    val db = "lifedb"
    WebLogCatalog.createDatabase(spark, db)
    WebLogCatalog.dropTableIfExists(spark, s"$db.raw")
    WebLogCatalog.dropTableIfExists(spark, s"$db.pq")
    WebLogCatalog.createRawJsonTable(spark, s"$db.raw", raw)
    WebLogCatalog.createParquetTable(spark, s"$db.pq", pq)

    // three consecutive ingest hours land in the raw zone
    val h0 = LocalDateTime.of(2024, 6, 1, 0, 0)
    (0 to 2).foreach { i =>
      val df = Generator.frame(spark, 100 + i, seed = 100 + i, h0.plusHours(i))
      Zones.writeRawJson(Validator.validate(df, "payload", "B").filter(col("valid")), raw)
    }
    // the hourly trigger fires at H+1 minute 10 and compacts H
    // (merge_small_files_lambda.py:105-108, athena_ctas.py:141-143)
    (0 to 2).foreach { i =>
      val trigger = h0.plusHours(i + 1).plusMinutes(10)
      val n = Compaction.run(spark, raw, pq, trigger,
        jsonTable = Some(s"$db.raw"), parquetTable = Some(s"$db.pq"))
      assert(n == 100 + i)
    }
    val total = spark.sql(s"SELECT count(*) FROM $db.pq").collect()(0).getLong(0)
    assert(total == 100 + 101 + 102)
    // per-partition counts via the catalog (partition-pruned reads)
    (0 to 2).foreach { i =>
      val c = spark.sql(
        s"SELECT count(*) FROM $db.pq WHERE year=2024 AND month=6 AND day=1 AND hour=$i")
        .collect()(0).getLong(0)
      assert(c == 100 + i)
    }
    // H+1 pre-registration: the raw table knows hour 3 even though only
    // hours 0-2 hold data (athena_ctas.py:55-59 rationale)
    val parts = WebLogCatalog.showPartitions(spark, s"$db.raw")
      .collect().map(_.getString(0)).toSet
    assert(parts.exists(_.contains("hour=3")))
  }

  test("upsert: replay idempotence and last-write-wins (FIXTURES.md §2)") {
    import spark.implicits._
    val path = tmpDir("iceberg") + "/t"
    val t = IcebergLikeTable(spark, path, "event", Seq("user_id", "timestamp"))
    assert(t.operation == "update")

    val batch = Seq(
      ("u1", "2024-03-01T10:00:00Z", "view", "a.com", 1L),
      ("u1", "2024-03-01T10:05:00Z", "cart", "a.com", 2L),
      ("u2", "2024-03-01T10:06:00Z", "visit", "b.com", 3L))
      .toDF("user_id", "timestamp", "event", "hostname", "seq")

    t.write(batch, "seq")
    assert(t.read.count() == 3)

    // same batch replayed -> table unchanged
    t.write(batch, "seq")
    assert(t.read.count() == 3)

    // re-keyed duplicate overwrites, not appends; intra-batch dup resolves
    // to the highest seq (last write wins)
    val update = Seq(
      ("u1", "2024-03-01T10:00:00Z", "view", "CHANGED.com", 4L),
      ("u1", "2024-03-01T10:00:00Z", "view", "CHANGED-AGAIN.com", 5L))
      .toDF("user_id", "timestamp", "event", "hostname", "seq")
    t.write(update, "seq")
    assert(t.read.count() == 3)
    val h = t.read.filter($"user_id" === "u1" && $"timestamp" === "2024-03-01T10:00:00Z")
      .select("hostname").collect()(0).getString(0)
    assert(h == "CHANGED-AGAIN.com")
  }

  test("C7 maintenance: hot partitions rewritten to few files, data unchanged") {
    import spark.implicits._
    val path = tmpDir("maint") + "/t"
    // retainVersions=1: the disk-level file counts below only reflect
    // the live snapshot when superseded versions GC immediately
    val t = IcebergLikeTable(spark, path, "event", Nil, retainVersions = 1)
    // 15 tiny appends -> 'view' partition accumulates >10 files
    (1 to 15).foreach { i =>
      t.append(Seq((s"u$i", s"2024-03-01T10:00:${f"$i%02d"}Z", "view", i.toLong))
        .toDF("user_id", "timestamp", "event", "seq"))
    }
    val before = t.read.orderBy("seq").collect()
    val filesBefore = Zones.partitionStats(spark, path).collect()(0).getLong(1)
    assert(filesBefore >= 15)

    val rewritten = t.maintain(fileThreshold = 10, targetFiles = 1)
    assert(rewritten == Seq("view"))
    val filesAfter = Zones.partitionStats(spark, path).collect()(0).getLong(1)
    assert(filesAfter < filesBefore && filesAfter <= 2)
    assert(t.read.orderBy("seq").collect().toSeq == before.toSeq)
    // below-threshold partitions untouched on a second run
    assert(t.maintain(fileThreshold = 10).isEmpty)
  }

  test("append mode when no unique keys declared (insert routing)") {
    import spark.implicits._
    val path = tmpDir("iceberg2") + "/t"
    val t = IcebergLikeTable(spark, path, "event", Nil)
    assert(t.operation == "insert")
    val batch = Seq(("u1", "2024-03-01T10:00:00Z", "view", 1L))
      .toDF("user_id", "timestamp", "event", "seq")
    t.write(batch, "seq")
    t.write(batch, "seq")
    assert(t.read.count() == 2) // duplicates appended, per reference insert mode
  }
}
