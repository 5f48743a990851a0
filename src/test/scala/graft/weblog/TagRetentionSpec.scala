package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Snapshot tags (Iceberg refs) + time-based retention: a tag pins its
  * snapshot past count- and time-based expiry, commit timestamps ride
  * the manifest, and `expireOlderThan` erases exactly the old,
  * untagged, non-live versions.
  */
class TagRetentionSpec extends SparkTestBase {

  private def rows(ids: Range, host: String) = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", host)).toDF("k", "event", "hostname")
  }

  test("all-digit tag names are refused (version resolution would shadow them)") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("tag_digits").toString + "/t", "event")
    t.append(rows(0 until 3, "v1"))
    // VERSION AS OF resolves numeric refs as snapshot versions before
    // tags — a '20240301' tag could silently pin the wrong snapshot
    intercept[IllegalArgumentException](t.tag("20240301", t.currentVersion.get))
    t.tag("rel-20240301", t.currentVersion.get) // a dash disambiguates
    assert(t.tags.contains("rel-20240301"))
  }

  test("a tag pins its snapshot past count-based retention") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("tag_keep").toString + "/t",
      "event", Nil, retainVersions = 1)
    t.append(rows(0 until 5, "v1"))
    val v1 = t.currentVersion.get
    t.tag("release", v1)
    // retention=1 would normally expire v1 on the next commits
    t.append(rows(5 until 8, "v2"))
    t.append(rows(8 until 10, "v3"))
    t.vacuum()
    assert(t.versions.contains(v1), "tagged version must survive GC")
    assert(t.readTag("release").count() == 5)
    assert(t.readAt(v1).count() == 5)
    assert(t.read.count() == 10)
    assert(t.tags == Map("release" -> v1))

    // dropping the tag releases the pin: the next commit expires v1
    t.dropTag("release")
    t.append(rows(10 until 11, "v4"))
    assert(!t.versions.contains(v1))
    intercept[NoSuchElementException](t.readTag("release"))
  }

  test("expireOlderThan erases old untagged versions only") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("tag_time").toString + "/t",
      "event", Nil, retainVersions = 8)
    t.append(rows(0 until 3, "a"))
    val v1 = t.currentVersion.get
    t.append(rows(3 until 6, "b"))
    val v2 = t.currentVersion.get
    t.append(rows(6 until 9, "c"))
    val live = t.currentVersion.get
    t.tag("pin", v2)
    // cutoff far in the future: everything old enough — but the live
    // snapshot and the tagged v2 must survive
    val expired = t.expireOlderThan(System.currentTimeMillis() + 60000)
    assert(expired == Seq(v1))
    assert(t.versions.sorted == Seq(v2, live).sorted)
    assert(t.read.count() == 9)
    assert(t.readTag("pin").count() == 6)
    // a cutoff in the past expires nothing
    assert(t.expireOlderThan(0L).isEmpty)
  }

  test("re-tagging forward is in-place; backward requires dropTag") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("tag_move").toString + "/t", "event", Nil)
    t.append(rows(0 until 2, "a"))
    val v1 = t.currentVersion.get
    t.append(rows(2 until 4, "b"))
    val v2 = t.currentVersion.get
    t.tag("latest-good", v1)
    t.tag("latest-good", v2) // forward: fine
    assert(t.tags("latest-good") == v2)
    intercept[IllegalArgumentException](t.tag("latest-good", v1))
    t.dropTag("latest-good")
    t.tag("latest-good", v1) // after the drop, backward is fine
    assert(t.tags("latest-good") == v1)
    // unknown versions and bad names are rejected
    intercept[IllegalArgumentException](t.tag("x", 999L))
    intercept[IllegalArgumentException](t.tag("bad name", v1))
  }

  test("commit timestamps ride the snapshots metadata table") {
    val before = System.currentTimeMillis()
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("tag_ts").toString + "/t", "event", Nil)
    t.append(rows(0 until 2, "a"))
    t.append(rows(2 until 4, "b"))
    val ts = t.snapshots.select("commit_ts").collect().map(_.getLong(0))
    assert(ts.length == 2)
    assert(ts.forall(v => v >= before && v <= System.currentTimeMillis()))
  }
}
