package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** METADATA-ONLY DELETE (Iceberg's partition-scoped delete, r12): a
  * condition that decides WHOLE LEAVES drops the matching leaves'
  * files from the manifest — zero data I/O, zero tombstones, zero
  * rewrites — whatever the table's delete mode. Everything else falls
  * back to the row-level machinery, and a table with live tombstones
  * refuses the fast path (masked rows must not double-count).
  */
class MetadataDeleteSpec extends SparkTestBase {

  private def files(t: IcebergLikeTable): (Set[String], Long) = {
    val rows = t.files.select("file", "is_delete").collect()
    (rows.filter(!_.getBoolean(1)).map(_.getString(0)).toSet,
      rows.count(_.getBoolean(1)).toLong)
  }

  test("identity layout: a partition-column DELETE is one subtractive manifest commit") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_id").toString + "/t", "day")
    t.append((0 until 120).map(i => (i % 4, i.toLong)).toDF("day", "v"))
    val (before, _) = files(t)
    val v0 = t.currentVersion.get
    val n = t.delete(col("day") === 2)
    assert(n == 30L, "deleted count must come from the stamped row counts")
    val (after, dels) = files(t)
    assert(after.subsetOf(before) && dels == 0L,
      "metadata delete writes NO files of any kind")
    assert(before.diff(after).forall(_.contains("day=2")),
      "only the matching leaves' files leave the manifest")
    assert(t.read.count() == 90L && t.read.filter(col("day") === 2).count() == 0L)
    // history intact: time travel still shows the dropped partition
    assert(t.readAt(v0).filter(col("day") === 2).count() == 30L)
  }

  test("hidden days() layout: an aligned time-range DELETE is metadata-only; unaligned falls back") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_days").toString + "/t",
      "ts_day", partitionTransform = Some("days(ts)"))
    t.append((0 until 96).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(f"2024-03-${i % 4 + 1}%02d 0${i % 6}:00:00")))
      .toDF("v", "ts"))
    val (before, _) = files(t)
    val n = t.delete(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-03 00:00:00")))
    assert(n == 24L)
    val (after, dels) = files(t)
    assert(after.subsetOf(before) && dels == 0L,
      "aligned day-range delete must be metadata-only")
    assert(t.read.count() == 72L)
    // an unconditioned DELETE FROM t is metadata-only on time layouts
    // too (AlwaysTrue decides every leaf) — proven on a twin so the
    // slice assertions below stay meaningful
    val tw = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_all").toString + "/t",
      "ts_day", partitionTransform = Some("days(ts)"))
    tw.append((0 until 20).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(s"2024-03-0${i % 3 + 1} 01:00:00")))
      .toDF("v", "ts"))
    val (allBefore, _) = files(tw)
    assert(tw.delete(lit(true)) == 20L)
    val (allAfter, allDels) = files(tw)
    assert(allAfter.isEmpty && allDels == 0L && allBefore.nonEmpty,
      "DELETE FROM t must drop every leaf without writing a file")
    assert(tw.read.count() == 0L)
    // an UNALIGNED boundary cannot decide whole leaves: the row path
    // rewrites matching files (new files appear), same answer
    // matches day-3 hours 3-5 (i%4==2 ∧ i%6>=3 ⇒ i≡10 mod 12: 8 rows)
    // plus ALL of day 4 (24 rows)
    val n2 = t.delete(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-03 03:00:00")))
    assert(n2 == 32L, s"unaligned delete removed $n2")
    val (after2, _) = files(t)
    assert(after2.diff(after).nonEmpty,
      "the unaligned delete must rewrite files (row-level path)")
    assert(t.read.count() == 40L)
  }

  test("multi spec: an identity-leg DELETE drops the leg's leaves across every day") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_multi").toString + "/t",
      "pe", partitionTransform = Some("multi(days(ts), identity(event))"))
    t.append((0 until 90).map(i => (i.toLong, s"e${i % 3}",
        java.sql.Timestamp.valueOf(s"2024-03-0${i % 3 + 1} 06:00:00")))
      .toDF("v", "event", "ts"))
    val (before, _) = files(t)
    val n = t.delete(col("event") === "e1")
    assert(n == 30L)
    val (after, dels) = files(t)
    assert(after.subsetOf(before) && dels == 0L,
      "identity-leg delete must be metadata-only")
    assert(t.read.filter(col("event") === "e1").count() == 0L)
    assert(t.read.count() == 60L)
  }

  test("merge-on-read tables take the metadata path too; live tombstones refuse it") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_mor").toString + "/t",
      "day", uniqueKeys = Seq("k"), numBuckets = 2)
    t.write((0 until 80).map(i => (s"k$i", i % 4, i.toLong)).toDF("k", "day", "seq"),
      "seq")
    val (before, _) = files(t)
    // a whole-partition retraction needs no tombstones even in MOR mode
    val n = t.deleteMergeOnRead(col("day") === 1)
    assert(n == 20L)
    val (after, dels) = files(t)
    assert(after.subsetOf(before) && dels == 0L,
      "partition-scoped MOR delete must drop leaves, not write tombstones")
    // now take a real tombstone... (rows 73 and 77 were day-1 and are
    // already gone with their leaves: 8 live matches)
    val n2 = t.deleteMergeOnRead(col("seq") >= 70L)
    assert(n2 == 8L)
    val (_, dels2) = files(t)
    assert(dels2 > 0L, "a data-column MOR delete writes tombstones")
    // ...and with tombstones LIVE, a partition delete must go through
    // the row machinery (the stamped counts would double-count masked
    // rows) — the returned count must be the LIVE day-2 rows only
    val liveBefore = t.read.count()
    val expected = (0 until 80).count(i => i % 4 == 2 && i < 70).toLong
    val n3 = t.deleteMergeOnRead(col("day") === 2)
    assert(n3 == expected,
      s"live tombstones must force the row path (got $n3, want $expected)")
    assert(t.read.count() == liveBefore - n3)
    assert(t.read.filter(col("day") === 2).count() == 0L)
  }

  test("non-intersecting live tombstones compose with the metadata path (r13)") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_carry").toString + "/t",
      "day", uniqueKeys = Seq("k"), numBuckets = 2)
    t.write((0 until 80).map(i => (s"k$i", i % 4, i.toLong)).toDF("k", "day", "seq"),
      "seq")
    // a data-column retraction scoped to day 3 ONLY: its tombstones
    // live in day=3 leaves and nowhere else (i%4==3 ∧ i%7==0 ⇒ 7,35,63)
    val nT = t.deleteMergeOnRead(col("day") === 3 && col("seq") % 7 === 0)
    assert(nT == 3L)
    val (dataBefore, delsBefore) = files(t)
    assert(delsBefore > 0L)
    // dropping day 0 intersects NO tombstone leaf: still one
    // subtractive manifest commit — zero files of any kind written,
    // the day-3 tombstones carried through untouched
    val n = t.deleteMergeOnRead(col("day") === 0)
    assert(n == 20L,
      s"day-0 leaves hold no masked rows, stamped counts are exact (got $n)")
    val (dataAfter, delsAfter) = files(t)
    assert(dataAfter.subsetOf(dataBefore) && delsAfter == delsBefore,
      "non-intersecting tombstones must not force the row path")
    assert(dataBefore.diff(dataAfter).forall(_.contains("day=0")),
      "only the dropped leaves' files leave the manifest")
    // the carried tombstones still mask their rows
    assert(t.read.count() == 80L - 20L - nT)
    assert(t.read.filter(col("day") === 3).count() == 17L)
    // dropping day 3 DOES intersect a tombstone leaf: the metadata path
    // refuses and the row machinery returns LIVE rows only
    val n3 = t.deleteMergeOnRead(col("day") === 3)
    assert(n3 == 17L,
      s"intersecting tombstones must force the row path (got $n3)")
    assert(t.read.filter(col("day") === 3).count() == 0L)
    assert(t.read.count() == 80L - 20L - 20L)
  }

  test("fallbacks: data-column predicates and NULL-keeping semantics are untouched") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mdel_fb").toString + "/t", "day")
    t.append((0 until 40).map(i =>
        (i % 2, if (i % 5 == 0) null else s"u$i", i.toLong))
      .toDF("day", "user", "v"))
    // mixed predicate: partition AND data column — row path, same answer
    val n = t.delete(col("day") === 1 && col("v") >= 30L)
    assert(n == (0 until 40).count(i => i % 2 == 1 && i >= 30).toLong)
    // NULL condition keeps the row (SQL three-valued DELETE)
    val n2 = t.delete(length(col("user")) > 100)
    assert(n2 == 0L)
    assert(t.read.count() == 40L - n)
  }
}
