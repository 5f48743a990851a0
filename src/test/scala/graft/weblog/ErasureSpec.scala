package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Cross-zone GDPR erasure: one user erased from the raw JSON-lines
  * zone (per-file copy-on-write), the compacted parquet zone
  * (manifest-commit rewrite), and the Iceberg-like table (row-level
  * DELETE) — in one sweep, leaving every other row intact.
  */
class ErasureSpec extends SparkTestBase {

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toString

  /** A small deterministic three-zone corpus: payloads for users u0..u9,
    * 4 hours × 5 events each, written raw → compacted → iceberg.
    */
  private def buildZones(): (String, String, IcebergLikeTable, DataFrame) = {
    import spark.implicits._
    val rows = for {
      u <- 0 until 10
      h <- 0 until 4
      i <- 0 until 5
    } yield (s"u$u", f"2024-01-01T$h%02d:0$i:00Z", if (i % 2 == 0) "view" else "click")
    val src = rows.toDF("user_id", "timestamp", "event")
      .withColumn("payload", concat(
        lit("""{"user_id": """"), col("user_id"),
        lit("""", "session_id": "s1", "event": """"), col("event"),
        lit("""", "ip": "10.0.0.1", "hostname": "h.example", "timestamp": """"),
        col("timestamp"), lit(""""}""")))
      .withColumn("ingest_ts", to_timestamp(col("timestamp"), WebLogSchema.TsPattern))
    val raw = tmpDir("erasure_raw")
    val pq = tmpDir("erasure_pq")
    Zones.writeRawJson(src, raw)
    for (h <- 0 until 4)
      Compaction.compactHour(spark, raw, pq, Compaction.HourPartition(2024, 1, 1, h))
    val t = IcebergLikeTable(spark, tmpDir("erasure_ice") + "/t", "event",
      Seq("user_id", "timestamp"))
    t.write(src.select("user_id", "timestamp", "event")
      .withColumn("seq", lit(1L)), "seq")
    (raw, pq, t, src)
  }

  private def rawUsers(raw: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").textFile(raw)
      .select(get_json_object(col("value"), "$.user_id").as("user_id"))

  private def compactedUsers(pq: String): DataFrame = {
    val dfs = (0 until 4).map(h =>
      Compaction.readCompactedHour(spark, pq, Compaction.HourPartition(2024, 1, 1, h)))
    dfs.reduce(_.unionByName(_)).select("user_id")
  }

  test("three-zone sweep erases the user everywhere, keeps everyone else") {
    val (raw, pq, t, _) = buildZones()
    val report = Erasure.eraseUser(spark, raw, pq, t, Set("u3"))

    // raw zone: u3 appeared in all 4 hour files
    assert(report.raw.erasedRows == 20L)
    assert(report.raw.affectedUnits >= 4L)
    assert(rawUsers(raw).filter(col("user_id") === "u3").count() == 0)
    assert(rawUsers(raw).count() == 180)

    // compacted zone: all 4 hour leaves rewritten through the manifest
    assert(report.compacted.erasedRows == 20L)
    assert(report.compacted.affectedUnits == 4L)
    assert(compactedUsers(pq).filter(col("user_id") === "u3").count() == 0)
    assert(compactedUsers(pq).count() == 180)

    // iceberg table: row-level DELETE
    assert(report.table.erasedRows == 20L)
    assert(t.read.filter(col("user_id") === "u3").count() == 0)
    assert(t.read.count() == 180)

    // untouched users are byte-identical in every zone
    assert(rawUsers(raw).distinct().count() == 9)

    // idempotence: re-running the sweep erases nothing further
    val again = Erasure.eraseUser(spark, raw, pq, t, Set("u3"))
    assert(again.raw.erasedRows == 0L && again.compacted.erasedRows == 0L &&
      again.table.erasedRows == 0L)
    assert(rawUsers(raw).count() == 180 && compactedUsers(pq).count() == 180 &&
      t.read.count() == 180)
  }

  test("multi-user batch sweep and non-matching users are no-ops") {
    val (raw, pq, t, _) = buildZones()
    // a user id that appears nowhere must not change anything
    val nothing = Erasure.eraseUser(spark, raw, pq, t, Set("u99"))
    assert(nothing.raw.erasedRows == 0L && nothing.compacted.erasedRows == 0L &&
      nothing.table.erasedRows == 0L)
    assert(rawUsers(raw).count() == 200)

    // batched request: two users in one sweep
    val batch = Erasure.eraseUser(spark, raw, pq, t, Set("u1", "u8"))
    assert(batch.raw.erasedRows == 40L)
    assert(batch.compacted.erasedRows == 40L)
    assert(batch.table.erasedRows == 40L)
    assert(rawUsers(raw).count() == 160)
    assert(compactedUsers(pq).count() == 160)
    assert(t.read.count() == 160)
    assert(rawUsers(raw).filter(col("user_id").isin("u1", "u8")).count() == 0)
  }

  test("raw-zone rewrite preserves the file set and survivor lines verbatim") {
    val (raw, _, _, _) = buildZones()
    val fs = new org.apache.hadoop.fs.Path(raw)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listFiles(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(raw), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) b += f.getPath.toString
      }
      b.result()
    }
    val before = listFiles()
    val beforeSurvivors = spark.read.option("recursiveFileLookup", "true")
      .textFile(raw)
      .filter(get_json_object(col("value"), "$.user_id") =!= "u5")
      .collect().sorted.toSeq
    Erasure.eraseRaw(spark, raw, Set("u5"))
    // same file names afterwards: concurrent listers never see a changed set
    assert(listFiles() == before)
    val after = spark.read.option("recursiveFileLookup", "true")
      .textFile(raw).collect().sorted.toSeq
    assert(after == beforeSurvivors)
  }

  test("immediate mode leaves no retained snapshot containing the user") {
    val (raw, pq, t, _) = buildZones()
    val preVersions = t.versions
    assert(preVersions.nonEmpty)
    val rep = Erasure.eraseUser(spark, raw, pq, t, Set("u3"), "user_id",
      immediate = true)
    assert(rep.table.erasedRows == 20L)
    // history collapsed to the post-delete snapshot: the pre-erasure
    // versions are expired, and the ONE retained snapshot is clean
    assert(t.versions.size == 1)
    preVersions.foreach { v =>
      assert(intercept[Exception](t.readAt(v).count()) != null)
    }
    assert(t.read.filter(col("user_id") === "u3").count() == 0)
    assert(t.read.count() == 180)
  }

  test("immediate sweep re-pins tags: no tagged snapshot keeps the user readable") {
    val (raw, pq, t, _) = buildZones()
    val v1 = t.currentVersion.get
    // a tag created BEFORE the erasure pins its snapshot past retention;
    // without re-pinning, readTag would serve the erased rows forever
    // while the sweep report claims the purge completed
    t.tag("audit-2024", v1)
    val rep = Erasure.eraseUser(spark, raw, pq, t, Set("u3"), "user_id",
      immediate = true)
    assert(rep.table.erasedRows == 20L)
    // the tag survives by NAME but now pins the post-delete snapshot
    assert(t.tags.keySet == Set("audit-2024"))
    assert(t.readTag("audit-2024").filter(col("user_id") === "u3").count() == 0)
    assert(t.readTag("audit-2024").count() == 180)
    // nothing retained or tagged precedes the erasure commit
    assert(t.versions.size == 1)
    t.versions.foreach(v =>
      assert(t.readAt(v).filter(col("user_id") === "u3").count() == 0))
    intercept[Exception](t.readAt(v1).count())
  }

  test("compacted-zone sweep keeps NULL-user rows co-located with matches") {
    import spark.implicits._
    // a leaf whose files mix the erased user, other users, and rows with
    // a NULL user field: `isin` evaluates to NULL for those, and a bare
    // negation would silently drop them — the worst failure class a GDPR
    // tool can have (destroying bystander data)
    val pq = tmpDir("erasure_nulls")
    val leaf = new org.apache.hadoop.fs.Path(pq, "year=2024/month=01/day=01/hour=00")
    val fs = leaf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = Seq(
      (Option("u1"), "view"), (Option("u1"), "click"),
      (Option("u2"), "view"), (Option.empty[String], "view"),
      (Option.empty[String], "click"))
      .toDF("user_id", "event")
    val staging = new org.apache.hadoop.fs.Path(pq, ".stage")
    rows.repartition(1).write.parquet(staging.toString)
    val files = Manifests.importStaged(fs, staging, leaf, 1L)
    Manifests.write(fs, leaf, 1L, files)
    fs.delete(staging, true)

    val report = Erasure.eraseCompacted(spark, pq, Set("u1"))
    assert(report == Erasure.ZoneReport(1L, 2L))
    val left = spark.read.parquet(leaf.toString)
    assert(left.count() == 3)
    assert(left.filter(col("user_id").isNull).count() == 2,
      "NULL-user bystander rows must survive the sweep")
    assert(left.filter(col("user_id") === "u2").count() == 1)
  }

  test("compacted-zone report counts manifest-resolved rows, not superseded files") {
    import spark.implicits._
    val pq = tmpDir("erasure_superseded")
    val leaf = new org.apache.hadoop.fs.Path(pq, "hour=00")
    val fs = leaf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitRows(df: org.apache.spark.sql.DataFrame, version: Long): Unit = {
      val staging = new org.apache.hadoop.fs.Path(pq, s".stage_$version")
      df.repartition(1).write.parquet(staging.toString)
      val files = Manifests.importStaged(fs, staging, leaf, version)
      Manifests.write(fs, leaf, version, files)
      fs.delete(staging, true)
    }
    // v1 holds 4 u9 rows; v2 supersedes it with 1 — the v1 file stays on
    // disk (GC not run), and a recursive listing would count it
    commitRows(Seq.fill(4)(("u9", "view")).toDF("user_id", "event"), 1L)
    commitRows(Seq(("u9", "view"), ("u2", "view")).toDF("user_id", "event"), 2L)
    val report = Erasure.eraseCompacted(spark, pq, Set("u9"))
    assert(report == Erasure.ZoneReport(1L, 1L),
      "the compliance report must count live rows only")
    val resolved = Manifests.resolve(fs, leaf).get._2
    val live = spark.read.parquet(
      resolved.map(f => new org.apache.hadoop.fs.Path(leaf, f).toString): _*)
    assert(live.select("user_id").as[String].collect().toSeq == Seq("u2"))
  }

  test("malformed and user-field-free lines are always kept") {
    import spark.implicits._
    val raw = tmpDir("erasure_mixed")
    val src = Seq(
      ("""{"user_id": "u1", "x": 1}""", "2024-01-01T00:00:00Z"),
      ("""{"other": "u1"}""", "2024-01-01T00:01:00Z"),
      ("""not json at all""", "2024-01-01T00:02:00Z"),
      ("""{"user_id": 7}""", "2024-01-01T00:03:00Z"),
      ("""{"user_id": "u2"}""", "2024-01-01T00:04:00Z"))
      .toDF("payload", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"), WebLogSchema.TsPattern))
    Zones.writeRawJson(src, raw)
    val report = Erasure.eraseRaw(spark, raw, Set("u1"))
    assert(report.erasedRows == 1L)
    val left = spark.read.option("recursiveFileLookup", "true")
      .textFile(raw).collect().toSet
    // the non-string user_id, the field-free JSON, and the non-JSON line
    // all survive — erasure never over-deletes
    assert(left == Set("""{"other": "u1"}""", """not json at all""",
      """{"user_id": 7}""", """{"user_id": "u2"}"""))
  }
}
