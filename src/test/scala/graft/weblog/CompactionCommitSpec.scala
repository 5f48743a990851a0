package graft.weblog

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The object-store-safe commit protocol (C3): a reader resolving the
  * newest manifest must see the complete old hour before the commit
  * point and the complete new hour after it — interleaved at EVERY step
  * of a re-compaction, never a missing or partial hour. This is the
  * property a rename-swap cannot give on stores where rename is
  * copy+delete.
  */
class CompactionCommitSpec extends SparkTestBase {

  private def hourRows(tag: String, n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, tag)).toDF("event_id", "hostname")
  }

  test("interleaved manifest reads see complete old or complete new, never missing") {
    val root = Files.createTempDirectory("commit").toString
    val hp = Compaction.HourPartition(2024, 3, 5, 6)
    val destDir = new Path(s"$root/pq/${hp.relPath}")
    val fs = destDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readNow() = Compaction.readCompactedHour(spark, s"$root/pq", hp)
      .select("hostname").distinct().collect().map(_.getString(0)).toSeq

    // version 1 committed via the same protocol
    val st1 = new Path(s"$root/st1")
    hourRows("v1", 40).repartition(2).write.parquet(st1.toString)
    val f1 = Compaction.importStaged(fs, st1, destDir, 1L)
    Compaction.writeManifest(fs, destDir, 1L, f1)
    Compaction.cleanupStale(fs, destDir)
    assert(readNow() == Seq("v1"))
    val n1 = readNow().size

    // version 2: interleave a reader between every commit step
    val st2 = new Path(s"$root/st2")
    hourRows("v2", 25).repartition(3).write.parquet(st2.toString)
    val f2 = Compaction.importStaged(fs, st2, destDir, 2L)
    // files imported but NOT committed: reader must still see all of v1
    assert(readNow() == Seq("v1"), "pre-commit reader must see complete old")
    assert(Compaction.readCompactedHour(spark, s"$root/pq", hp).count() == 40)
    Compaction.writeManifest(fs, destDir, 2L, f2)
    // commit point crossed: reader flips to all of v2, nothing mixed
    assert(readNow() == Seq("v2"), "post-commit reader must see complete new")
    assert(Compaction.readCompactedHour(spark, s"$root/pq", hp).count() == 25)
    Compaction.cleanupStale(fs, destDir)
    assert(readNow() == Seq("v2"), "GC must not disturb the committed version")
    assert(Compaction.readCompactedHour(spark, s"$root/pq", hp).count() == 25)
    // GC leaves exactly the live version's files + its manifest
    val names = fs.listStatus(destDir).map(_.getPath.getName).toSet
    assert(names == (f2.toSet + "_graft_manifest_v2"), s"stale files survived GC: $names")
    assert(n1 == 1)
  }

  test("compactHour end-to-end uses the manifest commit and re-runs idempotently") {
    val root = Files.createTempDirectory("commit-e2e").toString
    val hour = java.time.LocalDateTime.of(2024, 3, 5, 6, 0)
    val hp = Compaction.HourPartition.of(hour)
    val src = Generator.frame(spark, 200, seed = 9, hour)
    Zones.writeRawJson(
      Validator.validate(src, "payload", "B").filter(col("valid")), s"$root/raw")
    val n = Compaction.compactHour(spark, s"$root/raw", s"$root/pq", hp)
    assert(n > 0)
    val first = Compaction.readCompactedHour(spark, s"$root/pq", hp)
    val firstCount = first.count()
    assert(firstCount == n)
    // re-run: a new version supersedes the old, same data, no leftovers
    val n2 = Compaction.compactHour(spark, s"$root/raw", s"$root/pq", hp)
    assert(n2 == n)
    assert(Compaction.readCompactedHour(spark, s"$root/pq", hp).count() == n)
    val destDir = new Path(s"$root/pq/${hp.relPath}")
    val fs = destDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = fs.listStatus(destDir)
      .map(_.getPath.getName).count(_.startsWith("_graft_manifest_v"))
    assert(manifests == 1, "superseded manifest must be GC'd")
  }

  test("re-compaction from a clock that regressed still supersedes the live version") {
    // nanoTime's origin is arbitrary across JVM restarts: simulate a
    // restarted job whose nanoTime runs BELOW the live manifest version
    // by pre-committing a manifest with a far-future version. The next
    // compactHour must still win (version ties upward), or readers
    // would silently keep resolving the stale manifest forever.
    val root = Files.createTempDirectory("commit-clock").toString
    val hour = java.time.LocalDateTime.of(2024, 3, 5, 6, 0)
    val hp = Compaction.HourPartition.of(hour)
    val src = Generator.frame(spark, 50, seed = 11, hour)
    Zones.writeRawJson(
      Validator.validate(src, "payload", "B").filter(col("valid")), s"$root/raw")
    val destDir = new Path(s"$root/pq/${hp.relPath}")
    val fs = destDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val future = System.nanoTime() + 1000L * 3600 * 1000000000L // +1000h
    fs.mkdirs(destDir)
    Compaction.writeManifest(fs, destDir, future, Nil)
    val n = Compaction.compactHour(spark, s"$root/raw", s"$root/pq", hp)
    assert(n > 0)
    assert(Compaction.readCompactedHour(spark, s"$root/pq", hp).count() == n,
      "the fresh compaction must supersede the future-versioned manifest")
  }
}
