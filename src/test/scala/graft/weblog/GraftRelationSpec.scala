package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The table as a Catalyst relation ([[GraftFileIndex]]): manifest
  * resolution, partition pruning, stats/bloom file skipping — all
  * inside Spark's own scan planning, observed through the scan
  * operator's own numFiles metric.
  */
class GraftRelationSpec extends SparkTestBase {

  /** Files the executed scan actually read. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    scan.metrics("numFiles").value
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)

  test("relation prunes partitions, stats intervals and bloom points in-plan") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_tbl").toString + "/t",
      "event", Nil, statsColumns = Seq("n"), bloomColumns = Seq("user_id"),
      bloomExpectedItems = 1000L)
    // 4 appends × 2 event partitions; batch b carries n ∈ [b·100, …)
    // and ids spread over the whole range (id % 4 == b) so only the
    // bloom can answer point lookups
    for (b <- 0 until 4) {
      val df = (0 until 400).filter(_ % 4 == b)
        .map(i => (i.toLong + b * 1000, f"u$i%04d", if (i % 8 < 4) "e0" else "e1"))
        .toDF("n", "user_id", "event")
        .repartition(1)
      t.append(df)
    }
    val df = t.toDF
    assert(df.count() == 400)
    // 4 commits × 2 partitions = 8 files
    assert(scannedFiles(df) == 8)

    // partition pruning: one event partition = 4 files
    assert(scannedFiles(df.filter(col("event") === "e0")) == 4)
    sameRows(df.filter(col("event") === "e0"),
      t.read.filter(col("event") === "e0"))

    // stats interval pruning: batch 2's n range lives in 2 files
    assert(scannedFiles(df.filter(col("n") >= 2000L && col("n") < 3000L)) == 2)

    // bloom point pruning: one id lives in one commit (2 files), and
    // combined with the partition cut it is a single file
    assert(scannedFiles(df.filter(col("user_id") === "u0042")) <= 2)
    assert(scannedFiles(
      df.filter(col("user_id") === "u0042" && col("event") === "e0")) <= 1)
    sameRows(df.filter(col("user_id") === "u0042"),
      t.read.filter(col("user_id") === "u0042"))

    // absent values prune to an empty scan but stay row-correct
    assert(df.filter(col("user_id") === "zzzz").count() == 0)
    assert(df.filter(col("n") === 99999L).count() == 0)

    // the filters surface in the plan text like any file source
    val explained = df.filter(col("event") === "e0" && col("n") === 2000L)
      .queryExecution.executedPlan.toString
    assert(explained.contains("PartitionFilters") || explained.contains("Scan parquet"))
  }

  test("keyed tables hide gbucket and stay row-identical through the relation") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_keyed").toString + "/t",
      "event", Seq("user_id"), numBuckets = 4)
    t.write((0 until 100).map(i => (f"u$i%03d", "e", 1L))
      .toDF("user_id", "event", "seq"), "seq")
    val df = t.toDF
    assert(!df.columns.contains(t.bucketCol))
    sameRows(df, t.read)
    sameRows(df.filter(col("user_id") === "u042"),
      t.read.filter(col("user_id") === "u042"))
  }

  test("relation planning makes zero listStatus calls on stamped manifests") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_nolist").toString + "/t",
      "event", Nil, statsColumns = Seq("n"))
    for (b <- 0 until 3)
      t.append((b * 10 until (b + 1) * 10).map(i => (i.toLong, "e"))
        .toDF("n", "event").coalesce(1))
    val index = new GraftFileIndex(spark, t)
    // sizes come from the manifest entries stamped at import — planning
    // never lists a directory and never opens a footer
    assert(index.listStatusCalls == 0,
      s"expected zero listStatus round trips, got ${index.listStatusCalls}")
    val (_, snap) = t.resolveLive()
    assert(snap.entries.forall(e => e.size > 0L && e.rowCount == 10L))
    assert(index.sizeInBytes == snap.entries.map(_.size).sum)
    // and the stamped sizes drive a correct scan end to end
    val df = GraftFileIndex.relation(spark, t)
    assert(df.count() == 30)
    sameRows(df, t.read)
  }

  test("manifest-only count(*): rowCount matches the real count across ops") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_count").toString + "/t",
      "event", Seq("user_id"), numBuckets = 4)
    assert(t.rowCount.contains(0L))
    t.write((0 until 50).map(i => (s"u$i", "e", 1L))
      .toDF("user_id", "event", "seq"), "seq")
    assert(t.rowCount.contains(50L))
    assert(t.rowCount.get == t.read.count())
    // upsert: 5 updates (u45-u49) + 10 inserts (u50-u59)
    t.write((45 until 60).map(i => (s"u$i", "e", 2L))
      .toDF("user_id", "event", "seq"), "seq")
    assert(t.rowCount.contains(60L))
    assert(t.rowCount.get == t.read.count())
    t.delete(col("user_id") === "u7")
    assert(t.rowCount.contains(59L))
    assert(t.rowCount.get == t.read.count())
    t.maintain(fileThreshold = 1)
    assert(t.rowCount.contains(59L))
  }

  test("metadata-only aggregates: columnMinMax and partition-predicate counts") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_agg").toString + "/t",
      "event", Nil, statsColumns = Seq("n", "name"))
    t.append((0 until 100).map(i => (i.toLong, f"u$i%03d", if (i % 2 == 0) "e0" else "e1"))
      .toDF("n", "name", "event").coalesce(1))
    t.append((100 until 150).map(i => (i.toLong, f"u$i%03d", "e0"))
      .toDF("n", "name", "event").coalesce(1))
    // exact min/max from the manifest bounds — zero data I/O
    assert(t.columnMinMax("n").contains(("0", "149")))
    assert(t.columnMinMax("name").contains(("u000", "u149")))
    // unstamped / unknown columns are undecidable
    assert(t.columnMinMax("event").isEmpty) // partition col: not stamped
    assert(t.columnMinMax("nope").isEmpty)

    // partition-only predicates count from stamped row counts
    assert(t.rowCountWhere(col("event") === "e0").contains(100L))
    assert(t.rowCountWhere(col("event") === "e1").contains(50L))
    assert(t.rowCountWhere(col("event").isin("e0", "e1")).contains(150L))
    assert(t.rowCountWhere(col("event") === "zz").contains(0L))
    assert(t.rowCountWhere(lit(true)).contains(150L))
    // data-column predicates are not metadata-answerable
    assert(t.rowCountWhere(col("n") === 5L).isEmpty)
    assert(t.rowCountWhere(col("event") === "e0" && col("n") > 10L).isEmpty)
    // counts agree with the real scans
    assert(t.rowCountWhere(col("event") === "e0").get ==
      t.read.filter(col("event") === "e0").count())

    // a delete refreshes bounds and counts through the rewrite
    t.delete(col("n") >= 140L)
    assert(t.rowCountWhere(col("event") === "e0").contains(90L))
    assert(t.columnMinMax("n").contains(("0", "139")))
  }

  test("hidden-partition source predicates file-skip through the relation (single + multi legs)") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_hidden").toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    def day(d: Int) = (0 until 10).map(i =>
      (s"u$i", java.sql.Timestamp.valueOf(f"2024-03-$d%02d 06:00:00")))
      .toDF("user_id", "ts").coalesce(1)
    for (d <- 1 to 5) t.append(day(d))
    val df = t.toDF
    assert(scannedFiles(df) == 5)
    // a predicate on the SOURCE column (never the hidden pday) prunes
    // through the synthesized inverse bounds — relation path, not
    // just readWhere
    val day3 = col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-03 00:00:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-04 00:00:00"))
    assert(scannedFiles(df.filter(day3)) == 1,
      "days(ts) inverse bounds must file-skip in the relation")
    sameRows(df.filter(day3), t.read.filter(day3))
    // multi-leg composite: each leg prunes independently
    val m = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_multi").toString + "/t",
      partitionCol = "pmulti",
      partitionTransform = Some("multi(days(ts), identity(tag))"))
    for (d <- 1 to 3; tag <- Seq("a", "b"))
      m.append((0 until 5).map(i =>
        (s"u$i", tag, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 06:00:00")))
        .toDF("user_id", "tag", "ts").coalesce(1))
    val mdf = m.toDF
    assert(scannedFiles(mdf) == 6)
    assert(scannedFiles(mdf.filter(day3)) == 2, "time leg must prune the relation")
    assert(scannedFiles(mdf.filter(col("tag") === "a")) == 3,
      "identity leg must prune the relation")
    assert(scannedFiles(mdf.filter(day3 && col("tag") === "a")) == 1)
    sameRows(mdf.filter(day3 && col("tag") === "a"),
      m.read.filter(day3 && col("tag") === "a"))
  }

  test("void-transform (unpartitioned) tables read through the relation: null partition parses") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_void").toString + "/t",
      partitionCol = "gpart", partitionTransform = Some("void(n)"))
    t.append((0 until 20).map(i => (i.toLong, s"u$i")).toDF("n", "name"))
    // every leaf is the Hive null-partition sentinel — it must parse
    // as a NULL partition value, never as a literal (a LONG partition
    // column would otherwise crash the index)
    val df = t.toDF
    assert(df.count() == 20)
    sameRows(df, t.read)
  }

  test("the relation is snapshot-pinned; refresh follows new commits") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("rel_snap").toString + "/t", "event", Nil)
    t.append(Seq((1L, "e")).toDF("n", "event"))
    val df = t.toDF
    assert(df.count() == 1)
    t.append(Seq((2L, "e")).toDF("n", "event"))
    // pinned: the old relation still sees its snapshot
    assert(df.count() == 1)
    // a fresh relation sees the new one
    assert(t.toDF.count() == 2)
  }
}
