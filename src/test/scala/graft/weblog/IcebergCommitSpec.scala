package graft.weblog

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** S10 commit semantics: the upsert table's versioned-manifest commit
  * must give readers snapshot isolation (complete-old or complete-new,
  * never a half-rewritten leaf), create-only history (time travel), and
  * retention-bounded GC — the Iceberg contract the reference's table
  * declares (`web-analytics-iceberg/README.md:183-188`).
  */
class IcebergCommitSpec extends SparkTestBase {

  private def base(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (s"u$i", f"2024-03-05T06:${i % 60}%02d:00Z",
        if (i % 2 == 0) "view" else "click", "orig"))
      .toDF("user_id", "timestamp", "event", "hostname")
      .withColumn("seq", lit(1L))
  }

  private def hostCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("hostname").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("dormant files are invisible until the manifest commit point") {
    val dir = Files.createTempDirectory("ice-commit").toString
    val path = s"$dir/t"
    val table = IcebergLikeTable(spark, path, "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 8)
    table.write(base(100), "seq")
    assert(hostCounts(table.read) == Map("orig" -> 100L))

    // interleave: import a would-be merge result (every row updated)
    // into the live leaf dirs WITHOUT publishing a manifest — exactly
    // the window between an upsert's staged import and its commit point.
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(s"$dir/manual_staging")
    import spark.implicits._
    val sneak = base(100).withColumn("hostname", lit("half-committed"))
      .withColumn("gbucket",
        pmod(xxhash64($"user_id", $"timestamp"), lit(8L)).cast("int"))
    sneak.write.partitionBy("event", "gbucket").parquet(staging.toString)
    Manifests.importStagedTree(fs, staging, new Path(path), version = 999L)

    // a reader resolving the live manifest must NOT see the dormant files
    assert(hostCounts(table.read) == Map("orig" -> 100L),
      "pre-commit reader must see the complete old snapshot")
    assert(table.read.count() == 100)
  }

  test("in-flight reader keeps its complete snapshot across an upsert commit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-iso").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 8)
    table.write(base(100), "seq")

    // reader resolves version 1's file set NOW (file index is built at
    // read time) …
    val inFlight = table.read

    // … then a full-table update commits version 2 under it.
    val upd = base(100).withColumn("hostname", lit("updated"))
      .withColumn("seq", lit(2L))
    table.write(upd, "seq")

    // the in-flight reader still sees all of version 1 — no missing
    // leaves, no mixed hostnames; a fresh reader sees all of version 2.
    assert(hostCounts(inFlight) == Map("orig" -> 100L),
      "in-flight reader must keep its complete old snapshot")
    assert(hostCounts(table.read) == Map("updated" -> 100L),
      "post-commit reader must see the complete new snapshot")
  }

  test("time travel: readAt resolves retained historical snapshots") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-tt").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 8)
    table.write(base(60), "seq")
    val Seq(v1) = table.versions
    val upd = base(60).filter($"user_id".substr(2, 10).cast("int") < 30)
      .withColumn("hostname", lit("updated")).withColumn("seq", lit(2L))
    table.write(upd, "seq")
    val v2 = table.currentVersion.get
    assert(table.versions == Seq(v1, v2))

    assert(hostCounts(table.readAt(v1)) == Map("orig" -> 60L))
    assert(hostCounts(table.readAt(v2)) == Map("orig" -> 30L, "updated" -> 30L))
    assert(hostCounts(table.read) == hostCounts(table.readAt(v2)))
    // appends extend history the same way
    table.append(Seq(("x1", "2024-03-05T07:00:00Z", "view", "appended", 3L))
      .toDF("user_id", "timestamp", "event", "hostname", "seq"))
    assert(table.versions.size == 3)
    assert(table.readAt(v1).count() == 60)
    assert(table.read.count() == 61)
  }

  test("add-column schema evolution: old rows read null, history intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-evolve").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4)
    table.write(base(40), "seq")
    val v1 = table.currentVersion.get
    // the update batch carries a NEW column the table never had
    val upd = base(40).filter($"user_id".substr(2, 10).cast("int") < 10)
      .withColumn("country", lit("DE"))
      .withColumn("seq", lit(2L))
    table.write(upd, "seq")

    val live = table.read
    assert(live.columns.contains("country"))
    val byCountry = live.groupBy("country").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byCountry == Map(Some("DE") -> 10L, None -> 30L),
      s"stored rows must read null for the added column: $byCountry")
    assert(live.count() == 40)
    // time travel predates the column entirely
    assert(!table.readAt(v1).columns.contains("country"))
  }

  test("retention GC expires old snapshots but never the live one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-gc").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4,
      retainVersions = 1)
    table.write(base(50), "seq")
    val v1 = table.currentVersion.get
    table.write(base(50).withColumn("hostname", lit("updated"))
      .withColumn("seq", lit(2L)), "seq")

    // retainVersions=1: v1's manifest and superseded files are gone
    assert(table.versions.size == 1)
    intercept[NoSuchElementException](table.readAt(v1))
    assert(hostCounts(table.read) == Map("updated" -> 50L))

    // every remaining data file is referenced by the live manifest — no
    // stale leftovers on disk.
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val onDisk = walk(new java.io.File(s"$dir/t"))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.toString.stripPrefix(s"$dir/t").stripPrefix("/")).toSet
    val live = table.resolveLive()._2.files.toSet
    assert(onDisk == live, s"unreferenced files survived GC: ${onDisk -- live}")
  }

  test("vacuum sweeps crashed-commit orphans; empty micro-batches commit nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-orphan").toString
    val path = s"$dir/t"
    val table = IcebergLikeTable(spark, path, "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4)
    table.write(base(30), "seq")
    val v1 = table.currentVersion.get

    // simulate a commit that crashed between import and manifest create:
    // files land in the leaves but no manifest references them
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(s"$dir/crashed_staging")
    base(30).withColumn("hostname", lit("crashed"))
      .withColumn("gbucket",
        pmod(xxhash64($"user_id", $"timestamp"), lit(4L)).cast("int"))
      .write.partitionBy("event", "gbucket").parquet(staging.toString)
    val orphans = Manifests.importStagedTree(fs, staging, new Path(path), 777L)
    assert(orphans.nonEmpty)
    // dormant: no reader sees them; a retried upsert ignores them
    assert(table.read.count() == 30)

    // an EMPTY batch (e.g. a fully-invalidated micro-batch) is a no-op —
    // no new version, no crash on the empty-pairs reduce
    table.write(base(0), "seq")
    assert(table.currentVersion.contains(v1), "empty batch must not commit")

    // vacuum sweeps the orphans but never a retained snapshot's files
    table.vacuum()
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val onDisk = walk(new java.io.File(path))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.toString.stripPrefix(path).stripPrefix("/")).toSet
    assert(orphans.forall(o => !onDisk.contains(o._1)), "orphans must be swept")
    assert(table.read.count() == 30)
    assert(table.readAt(v1).count() == 30)
  }

  test("row-level delete rewrites only affected leaves; history keeps the rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-del").toString
    val path = s"$dir/t"
    val table = IcebergLikeTable(spark, path, "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 8)
    table.write(base(200), "seq")
    val v1 = table.currentVersion.get

    def leafFiles(): Map[String, Set[String]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .groupBy(_.getParentFile.toString.stripPrefix(path).stripPrefix("/"))
        .map { case (leaf, fs) => leaf -> fs.map(_.getName).toSet }
    }
    val before = leafFiles()

    // GDPR erasure of one user: only u7's (event, gbucket) leaf gains a
    // rewrite; every other leaf's file set is untouched on disk
    val n = table.delete($"user_id" === "u7")
    assert(n == 1L, s"expected exactly u7's row deleted, got $n")
    assert(table.read.count() == 199)
    assert(table.read.filter($"user_id" === "u7").count() == 0)
    val after = leafFiles()
    val changed = before.keySet.filter(k => !before(k).subsetOf(after.getOrElse(k, Set())))
    assert(changed.isEmpty, s"delete must only ADD files pre-vacuum: $changed")
    val grew = after.keySet.filter(k => after(k) != before.getOrElse(k, Set()))
    assert(grew.size == 1, s"exactly one leaf may be rewritten: $grew")

    // the retained historical snapshot still has the row (Iceberg's
    // delete + expire_snapshots GDPR posture); matching nothing is a no-op
    assert(table.readAt(v1).filter($"user_id" === "u7").count() == 1)
    val v2 = table.currentVersion.get
    assert(table.delete($"user_id" === "no-such-user") == 0L)
    assert(table.currentVersion.contains(v2), "no-op delete must not commit")

    // a predicate matching a whole leaf's rows drops the leaf from the
    // live manifest; NULL predicate rows survive (DELETE semantics)
    val allViews = table.delete($"event" === "view")
    assert(allViews == 100L)
    assert(table.read.filter($"event" === "view").count() == 0)
    assert(table.read.count() == 99)
  }

  test("maintain compacts hot leaves via a snapshot commit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ice-maint").toString
    val table = IcebergLikeTable(spark, s"$dir/t", "event",
      uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 2)
    // many small appends -> the live snapshot accumulates many files per
    // leaf (append carries every prior file into the new manifest)
    (0 until 6).foreach { i =>
      table.append(base(40).withColumn("hostname", lit(s"h$i")))
    }
    val before = hostCounts(table.read)
    val rewritten = table.maintain(fileThreshold = 2)
    assert(rewritten.nonEmpty, "expected hot leaves to be rewritten")
    assert(hostCounts(table.read) == before, "maintain must not change content")
    // live snapshot now has <= threshold files per rewritten leaf
    val live = table.resolveLive()._2.files
    val perLeaf = live.groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perLeaf.values.forall(_.size <= 2),
      s"leaf still hot after maintain: ${perLeaf.view.mapValues(_.size).toMap}")
  }
}
