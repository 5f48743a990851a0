package graft.weblog

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hidden partitioning (Iceberg partition transforms): the partition
  * column is DERIVED (`days(ts)` / `hours(ts)` / `truncate(w, col)`),
  * invisible to readers, and predicates on the SOURCE column prune
  * partitions — no user-managed partition key anywhere.
  */
class HiddenPartitionSpec extends SparkTestBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:15:00")

  private def events(days: Range): DataFrame = {
    import spark.implicits._
    days.flatMap(d => (0 until 4).map(h =>
      (s"u$d-$h", s"e$d$h", ts(d, h * 6)))).toDF("user_id", "event_id", "ts")
  }

  private def daysTable(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))

  test("days(ts): derived at write, hidden at read, schema round-trips") {
    val t = daysTable("hp_basic")
    for (d <- 1 to 5) t.append(events(d to d).coalesce(1))
    assert(t.read.columns.toSet == Set("user_id", "event_id", "ts"),
      s"partition column must stay hidden: ${t.read.columns.mkString(",")}")
    assert(t.read.count() == 20)
    assert(t.toDF.columns.toSet == Set("user_id", "event_id", "ts"))
    // the physical layout really is one directory per day
    val leaves = t.files.select("file").collect()
      .map(_.getString(0).split('/').head).distinct.sorted
    assert(leaves.length == 5 && leaves.forall(_.startsWith("pday=")))
  }

  test("predicates on the source column prune partitions (no partition key in the query)") {
    val t = daysTable("hp_prune")
    for (d <- 1 to 7) t.append(events(d to d).coalesce(1))
    assert(t.filesFor(lit(true)).size == 7)
    // equality-day slice: 1 of 7 files planned
    val day3 = col("ts") >= lit(ts(3, 0)) && col("ts") < lit(Timestamp.valueOf("2024-03-04 00:00:00"))
    assert(t.filesFor(day3).size == 1, "a one-day slice must plan one file")
    assert(t.readWhere(day3).count() == 4)
    // range spanning two days
    val d45 = col("ts") >= lit(Timestamp.valueOf("2024-03-04 12:00:00")) &&
      col("ts") <= lit(Timestamp.valueOf("2024-03-05 11:59:59"))
    assert(t.filesFor(d45).size == 2)
    assert(t.readWhere(d45).count() == 4 - 2 + 2) // hours 12,18 of d4; 0,6 of d5
    // a predicate the transform can't invert scans everything — sound
    assert(t.filesFor(col("user_id") === "u3-1").size == 7)
    assert(t.readWhere(col("user_id") === "u3-1").count() == 1)
  }

  test("hours(ts) and truncate(w, col) transforms") {
    import spark.implicits._
    val h = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_hours").toString + "/t",
      partitionCol = "phour", partitionTransform = Some("hours(ts)"))
    for (hr <- 0 until 6)
      h.append(Seq((s"u$hr", ts(1, hr))).toDF("user_id", "ts").coalesce(1))
    assert(h.filesFor(lit(true)).size == 6)
    // [02:15, 04:15) spans hour-partitions 2, 3 AND 4 (hour 4's file
    // may hold rows in [04:00, 04:15) — keeping it is the sound plan)
    val slice = col("ts") >= lit(ts(1, 2)) && col("ts") < lit(ts(1, 4))
    assert(h.filesFor(slice).size == 3)
    assert(h.readWhere(slice).count() == 2)
    // an aligned hour boundary prunes exactly
    val aligned = col("ts") >= lit(Timestamp.valueOf("2024-03-01 02:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-01 04:00:00"))
    assert(h.filesFor(aligned).size == 2)

    val tr = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_trunc").toString + "/t",
      partitionCol = "pbin", partitionTransform = Some("truncate(100, amount)"))
    tr.append((0 until 500 by 10).map(a => (s"o$a", a.toLong))
      .toDF("order_id", "amount").repartition(5, col("amount")))
    val bin = col("amount") >= 200L && col("amount") < 300L
    val planned = tr.filesFor(bin)
    assert(planned.forall(_.startsWith("pbin=200/")),
      s"only the 200-bin may be planned: ${planned.mkString(",")}")
    assert(tr.readWhere(bin).count() == 10)
    assert(tr.read.columns.toSet == Set("order_id", "amount"))
  }

  test("keyed tables: upsert/merge route through the derived partition; CDC works") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_keyed").toString + "/t",
      partitionCol = "pday", uniqueKeys = Seq("k"), numBuckets = 2,
      partitionTransform = Some("days(ts)"))
    def batch(host: String, seq: Long): DataFrame =
      (0 until 10).map(i => (s"k$i", ts(1 + i % 2, 6), host, seq))
        .toDF("k", "ts", "hostname", "seq")
    t.write(batch("orig", 1L), "seq")
    assert(t.read.count() == 10)
    assert(t.read.columns.toSet == Set("k", "ts", "hostname", "seq"))
    // upsert: same keys, new hostnames — no duplicates across leaves
    t.write(batch("gen2", 2L), "seq")
    assert(t.read.count() == 10)
    assert(t.read.filter(col("hostname") === "gen2").count() == 10)
    // stale replay loses
    t.write(batch("stale", 1L), "seq")
    assert(t.read.filter(col("hostname") === "gen2").count() == 10)
    // MERGE with tombstones routed by the derived value (source col
    // carried, partition derived inside the merge)
    val dels = Seq(("k0", ts(1, 6), 3L), ("k1", ts(2, 6), 3L))
      .toDF("k", "ts", "seq")
    t.merge(batch("gen2", 2L).filter(col("k") > "k5"), dels, "seq")
    assert(t.read.count() == 8)
    // CDC diff across the merge window
    val live = t.currentVersion.get
    val ch = t.changesBetween(live - 1, live)
    assert(ch.filter(col("_change_type") === "delete").count() == 2)
  }

  test("deletes (all three kinds) and maintain compose with the transform") {
    val t = daysTable("hp_delete")
    for (d <- 1 to 4) t.append(events(d to d).coalesce(1))
    // positional MOR delete targeted by a source-column predicate: only
    // day-2's file is a candidate (pruned discovery), data untouched
    val day2 = col("ts") >= lit(ts(2, 0)) && col("ts") < lit(ts(3, 0))
    assert(t.deletePositional(day2 && col("user_id") === "u2-1") == 1L)
    assert(t.read.count() == 15)
    val delFiles = t.files.filter(col("is_delete")).select("file")
      .collect().map(_.getString(0))
    assert(delFiles.nonEmpty && delFiles.forall(_.startsWith("pday=")))
    // copy-on-write delete of a whole hidden day
    assert(t.delete(day2) == 3L)
    assert(t.read.count() == 12)
    assert(t.filesFor(lit(true)).size == 3)
    // maintain under a transform keeps layout + row set
    t.maintain(fileThreshold = 0, deleteFileThreshold = 1)
    assert(t.read.count() == 12)
  }

  test("layout spec pins the transform; redeclaring differently fails loudly") {
    val root = Files.createTempDirectory("hp_layout").toString + "/t"
    val t = IcebergLikeTable(spark, root,
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    t.append(events(1 to 1))
    val wrong = IcebergLikeTable(spark, root,
      partitionCol = "pday", partitionTransform = Some("hours(ts)"))
    intercept[IllegalArgumentException](wrong.append(events(2 to 2)))
    val wrong2 = IcebergLikeTable(spark, root, partitionCol = "pday")
    intercept[IllegalArgumentException](wrong2.append(
      events(2 to 2).withColumn("pday", lit(99L))))
  }

  test("pre-epoch timestamps bucket by exact floor division") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_epoch").toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    val old = Timestamp.valueOf("1969-12-31 18:00:00") // day -1, not day 0
    t.append(Seq(("u0", old)).toDF("user_id", "ts"))
    val leaf = t.files.select("file").head.getString(0).split('/').head
    assert(leaf == "pday=-1", s"pre-epoch day must floor to -1, got $leaf")
    assert(t.readWhere(col("ts") === lit(old)).count() == 1)
    assert(t.filesFor(col("ts") >= lit(Timestamp.valueOf("1970-01-01 00:00:00"))).isEmpty)
  }

  test("months(ts) and years(ts): Iceberg ordinals, calendar-width pruning, pre-epoch (r13)") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_months").toString + "/t",
      partitionCol = "pmonth", partitionTransform = Some("months(ts)"))
    val rows = Seq(
      ("jan24", Timestamp.valueOf("2024-01-15 08:00:00")),  // (2024-1970)*12+0 = 648
      ("feb24", Timestamp.valueOf("2024-02-29 23:59:59")),  // leap February: 649
      ("mar24", Timestamp.valueOf("2024-03-01 00:00:00")),  // month boundary: 650
      ("dec69", Timestamp.valueOf("1969-12-31 10:00:00")))  // pre-epoch: -1
    t.append(rows.toDF("tag", "ts").coalesce(1))
    val leaves = t.files.select("file").collect()
      .map(_.getString(0).split('/').head.stripPrefix("pmonth=").toLong).toSet
    assert(leaves == Set(648L, 649L, 650L, -1L),
      s"Iceberg month ordinals expected, got $leaves")
    // calendar-width pruning: a February slice opens February's file only
    val feb = col("ts") >= lit(Timestamp.valueOf("2024-02-01 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(t.filesFor(feb).size == 1)
    assert(t.readWhere(feb).collect().map(_.getString(0)).toSeq == Seq("feb24"))
    // leap-month inverse image: Feb 29 23:59:59 is INSIDE month 649's
    // bounds (a 28-day assumption would mis-prune it)
    assert(t.readWhere(col("ts") === lit(rows(1)._2)).count() == 1)
    // whole-table count answers from metadata; the derived column is
    // hidden from reads
    assert(t.rowCount.contains(4L))
    assert(t.read.columns.toSet == Set("tag", "ts"))

    val ty = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_years").toString + "/t",
      partitionCol = "pyear", partitionTransform = Some("years(ts)"))
    ty.append(rows.toDF("tag", "ts").coalesce(1))
    val yleaves = ty.files.select("file").collect()
      .map(_.getString(0).split('/').head.stripPrefix("pyear=").toLong).toSet
    assert(yleaves == Set(54L, -1L), s"Iceberg year ordinals expected, got $yleaves")
    val y24 = col("ts") >= lit(Timestamp.valueOf("2024-01-01 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2025-01-01 00:00:00"))
    assert(ty.filesFor(y24).size == 1)
    assert(ty.readWhere(y24).count() == 3)
    // months inside a multi(...) spec prune per leg
    val tm = IcebergLikeTable(spark,
      Files.createTempDirectory("hp_mmulti").toString + "/t",
      partitionCol = "pme",
      partitionTransform = Some("multi(months(ts), identity(tag))"))
    tm.append(rows.toDF("tag", "ts").coalesce(1))
    assert(tm.filesFor(feb).size == 1)
    assert(tm.filesFor(col("tag") === "jan24").size == 1)
    assert(tm.readWhere(feb && col("tag") === "feb24").count() == 1)
  }

  test("dynamic partition overwrite replaces whole months on a months() layout (r14)") {
    import spark.implicits._
    def ts(month: Int, day: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-$month%02d-$day%02d 09:00:00")
    val t = IcebergLikeTable(spark,
      java.nio.file.Files.createTempDirectory("hp_owp").toString + "/t",
      partitionCol = "pm", partitionTransform = Some("months(ts)"))
    t.append((1 to 3).flatMap(m => (1 to 5).map(d =>
      (s"u$m-$d", ts(m, d)))).toDF("user_id", "ts").coalesce(1))
    val before = t.filesFor(lit(true)).toSet
    // the backfill batch touches ONLY February: its leaf is replaced
    // wholesale, January and March carry over by reference
    t.overwritePartitions(
      (1 to 2).map(d => (s"redo-$d", ts(2, d))).toDF("user_id", "ts").coalesce(1))
    val after = t.filesFor(lit(true)).toSet
    // 2024-02 ordinal = (2024-1970)*12 + 1 = 649
    val febBefore = before.filter(_.startsWith("pm=649/"))
    assert(febBefore.nonEmpty, s"fixture must have a February leaf: $before")
    assert(febBefore.forall(!after.contains(_)),
      s"February's old files must leave the manifest: kept ${febBefore.intersect(after)}")
    assert((before -- febBefore).subsetOf(after),
      "January and March must carry over by reference")
    assert(t.read.count() == 10 + 2)
    val feb = col("ts") >= lit(ts(2, 1)) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(t.readWhere(feb).collect().forall(
      _.getAs[String]("user_id").startsWith("redo-")),
      "the replaced month must hold only the backfill rows")
  }
}
