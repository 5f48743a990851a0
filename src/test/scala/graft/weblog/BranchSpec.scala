package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Snapshot branches (Iceberg refs) and the write-audit-publish
  * workflow: a branch is an independent version chain over the same
  * immutable leaf manifests; branch commits never disturb main, GC on
  * either chain never sweeps files the other references, and
  * fast-forward publishes audited branch work as one O(1) manifest
  * commit.
  */
class BranchSpec extends SparkTestBase {

  private def rows(ids: Range, host: String, v: Long) = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", host, v)).toDF("k", "event", "hostname", "seq")
  }

  test("write-audit-publish: branch commits stay isolated until fast-forward") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_wap").toString + "/t",
      "event", Seq("k"), numBuckets = 4)
    t.write(rows(0 until 30, "orig", 1L), "seq")
    val mainV = t.currentVersion.get

    // WRITE: stage changes on a branch — an O(1) create at main's live
    val wap = t.createBranch("audit")
    assert(wap.read.count() == 30, "branch v1 equals main's live snapshot")
    wap.write(rows(0 until 5, "fixed", 2L), "seq")
    wap.delete(col("k") === "k7")

    // AUDIT: main is untouched, the branch shows the staged state
    assert(t.currentVersion.contains(mainV))
    assert(t.read.count() == 30)
    assert(t.read.filter(col("hostname") === "fixed").count() == 0)
    assert(wap.read.count() == 29)
    assert(wap.read.filter(col("hostname") === "fixed").count() == 5)
    assert(t.branches == Seq("audit"))

    // PUBLISH: fast-forward main to the audited snapshot — one commit
    val published = t.fastForward(wap)
    assert(published == mainV + 1)
    assert(t.read.count() == 29)
    assert(t.read.filter(col("hostname") === "fixed").count() == 5)
    assert(t.read.filter(col("k") === "k7").count() == 0)
    // history: main's pre-publish snapshot is still readable
    assert(t.readAt(mainV).count() == 30)

    // cleanup: drop the branch, vacuum sweeps nothing main references
    t.dropBranch("audit")
    assert(t.branches.isEmpty)
    t.vacuum()
    assert(t.read.count() == 29)
  }

  test("GC on one chain never sweeps files the other references") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_gc").toString + "/t",
      "event", Seq("k"), numBuckets = 2, retainVersions = 1)
    t.write(rows(0 until 20, "orig", 1L), "seq")
    val b = t.createBranch("slow")
    // main rewrites EVERYTHING repeatedly under retention 1: without the
    // cross-chain referenced-set, main's GC would delete the files the
    // branch's v1 still references
    for (v <- 2L to 4L)
      t.write(rows(0 until 20, s"gen$v", v), "seq")
    t.vacuum()
    assert(t.read.filter(col("hostname") === "gen4").count() == 20)
    assert(b.read.count() == 20, "branch must survive main's GC")
    assert(b.read.filter(col("hostname") === "orig").count() == 20)

    // and the reverse: branch commits + branch GC keep main intact
    for (v <- 2L to 4L)
      b.write(rows(0 until 20, s"br$v", v), "seq")
    b.vacuum()
    assert(b.read.filter(col("hostname") === "br4").count() == 20)
    assert(t.read.filter(col("hostname") === "gen4").count() == 20)
  }

  test("GDPR erasure reaches branches: no chain retains the erased user") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("br_gdpr").toString
    val raw = s"$base/raw"
    val pq = s"$base/pq"
    val t = IcebergLikeTable(spark, s"$base/t", "event", Seq("user_id", "timestamp"))
    val rowsDf = (0 until 10).flatMap(u => (0 until 3).map(m =>
        (s"u$u", f"2024-01-01T00:0$m%d:00Z", "view", 1L)))
      .toDF("user_id", "timestamp", "event", "seq")
    // minimal raw/compacted zones so the sweep has all three + table
    Zones.writeRawJson(rowsDf.select(
      concat(lit("""{"user_id": """"), col("user_id"), lit(""""}""")).as("payload"),
      to_timestamp(col("timestamp"), WebLogSchema.TsPattern).as("ingest_ts")), raw)
    t.write(rowsDf, "seq")
    val b = t.createBranch("wap")
    b.write(rowsDf.withColumn("seq", lit(2L)), "seq") // branch has its own copy
    val rep = Erasure.eraseUser(spark, raw, pq, t, Set("u3"), "user_id",
      immediate = true)
    assert(rep.table.erasedRows == 6L, "main AND branch rows erased")
    assert(t.read.filter(col("user_id") === "u3").count() == 0)
    assert(t.forBranch("wap").read.filter(col("user_id") === "u3").count() == 0)
    assert(t.forBranch("wap").read.count() == 27)
    // immediate mode: no retained snapshot on ANY chain holds the user
    (t.versions.map(v => t.readAt(v)) ++
      t.forBranch("wap").versions.map(v => t.forBranch("wap").readAt(v)))
      .foreach(df => assert(df.filter(col("user_id") === "u3").count() == 0))
  }

  test("fast-forward requires ancestry: a diverged target rejects the publish") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_ffdiv").toString + "/t",
      "event", Seq("k"), numBuckets = 4)
    t.write(rows(0 until 10, "orig", 1L), "seq")
    val b = t.createBranch("feature")
    b.write(rows(0 until 2, "branch", 2L), "seq")
    // main commits AFTER the branch was cut: a 'fast-forward' would
    // silently discard this commit from the live view
    t.write(rows(10 until 12, "mainline", 2L), "seq")
    val e = intercept[IllegalStateException](t.fastForward(b))
    assert(e.getMessage.contains("not a fast-forward"))
    assert(t.read.filter(col("hostname") === "mainline").count() == 2,
      "the live view keeps the concurrent commit")
  }

  test("sequential publishes from one branch stay fast-forwards; a commit in between breaks ancestry") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_ffseq").toString + "/t",
      "event", Seq("k"), numBuckets = 4)
    t.write(rows(0 until 10, "orig", 1L), "seq")
    val wap = t.createBranch("audit")
    wap.write(rows(0 until 2, "fix1", 2L), "seq")
    t.fastForward(wap)
    wap.write(rows(2 until 4, "fix2", 3L), "seq")
    // the target's live snapshot IS this branch's earlier state — still
    // an ancestry-preserving publish
    t.fastForward(wap)
    assert(t.read.filter(col("hostname") === "fix2").count() == 2)
    // ...but a normal main commit in between breaks ancestry again
    t.write(rows(20 until 21, "hot", 4L), "seq")
    wap.write(rows(4 until 5, "fix3", 5L), "seq")
    intercept[IllegalStateException](t.fastForward(wap))
    // the branch survives many commits: the branch-point stamp is
    // carried past v1's retention expiry, so the check still fires
    val t2 = IcebergLikeTable(spark,
      Files.createTempDirectory("br_ffret").toString + "/t",
      "event", Seq("k"), numBuckets = 2, retainVersions = 2)
    t2.write(rows(0 until 5, "orig", 1L), "seq")
    val long = t2.createBranch("long")
    for (v <- 2L to 6L) long.write(rows(0 until 5, s"gen$v", v), "seq")
    assert(long.versions.size == 2, "branch v1 expired by retention")
    t2.write(rows(5 until 6, "mainline", 2L), "seq")
    intercept[IllegalStateException](t2.fastForward(long))
  }

  test("metadata-only commits break fast-forward ancestry too (r12)") {
    // widen/rename/constraint/analyze commits change the live state the
    // same as a data commit — a later fast-forward from the previously
    // published branch must see DIVERGENCE, never silently clobber the
    // metadata change (the FfKey ancestry mark must drop)
    def fixture(dir: String): (IcebergLikeTable, IcebergLikeTable) = {
      val t = IcebergLikeTable(spark,
        Files.createTempDirectory(dir).toString + "/t",
        "event", Seq("k"), numBuckets = 2)
      t.write(rows(0 until 6, "orig", 1L), "seq")
      val wap = t.createBranch("audit")
      wap.write(rows(0 until 2, "fix1", 2L), "seq")
      t.fastForward(wap)
      wap.write(rows(2 until 4, "fix2", 3L), "seq")
      (t, wap)
    }
    val (t1, w1) = fixture("br_ffmeta1")
    t1.addConstraint("host_nonempty", "length(hostname) > 0")
    intercept[IllegalStateException](t1.fastForward(w1))
    assert(t1.constraints.contains("host_nonempty"),
      "the constraint the divergence protects must still be live")
    val (t2, w2) = fixture("br_ffmeta2")
    t2.renameColumn("hostname", "host")
    intercept[IllegalStateException](t2.fastForward(w2))
    val (t3, w3) = fixture("br_ffmeta3")
    t3.analyze(Seq("hostname"))
    intercept[IllegalStateException](t3.fastForward(w3))
  }

  test("CHECK constraints survive merge-on-read and positional deletes (r12)") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_morcon").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    t.write(rows(0 until 8, "orig", 1L), "seq")
    t.addConstraint("host_nonempty", "length(hostname) > 0")
    t.deleteMergeOnRead(col("k") === "k1")
    assert(t.constraints.contains("host_nonempty"),
      "an equality-delete commit must carry the constraints")
    intercept[Exception] {
      t.write(Seq(("kx", "e", "", 9L)).toDF("k", "event", "hostname", "seq"),
        "seq")
    }
    val t2 = IcebergLikeTable(spark,
      Files.createTempDirectory("br_poscon").toString + "/t", "event")
    t2.append(rows(0 until 8, "orig", 1L))
    t2.addConstraint("host_nonempty", "length(hostname) > 0")
    t2.deletePositional(col("k") === "k1")
    assert(t2.constraints.contains("host_nonempty"),
      "a positional-delete commit must carry the constraints")
    intercept[Exception] {
      t2.append(Seq(("kx", "e", "", 9L)).toDF("k", "event", "hostname", "seq"))
    }
  }

  test("branch bookkeeping: duplicates rejected, empty tables unbranchable, exactly-once per chain") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_book").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    intercept[IllegalArgumentException](t.createBranch("x")) // never committed
    t.write(rows(0 until 5, "a", 1L), "seq")
    val b = t.createBranch("x")
    intercept[IllegalArgumentException](t.createBranch("x")) // duplicate
    intercept[IllegalArgumentException](t.createBranch("main"))
    // append high-water marks are chain-local: the same (stream, batch)
    // applies once per chain
    b.write(rows(5 until 8, "b", 2L), "seq", Some(("s1", 1L)))
    b.write(rows(8 until 99, "never", 2L), "seq", Some(("s1", 1L))) // replay: skipped
    assert(b.read.count() == 8)
    t.write(rows(5 until 8, "b", 2L), "seq", Some(("s1", 1L)))
    assert(t.read.count() == 8, "main's chain has its own replay cursor")
    // tags are main-only
    intercept[IllegalArgumentException](b.tag("t1", b.currentVersion.get))
  }

  test("all-digit branch names are refused: numeric VERSION AS OF resolution must never shadow a ref") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("br_digits").toString + "/t", "day")
    t.append(Seq((1L, 1)).toDF("v", "day"))
    // VERSION AS OF '7' resolves snapshot 7 BEFORE any ref lookup — a
    // branch literally named '7' could never be addressed (or, worse,
    // would silently read the same-numbered main-chain snapshot)
    val e = intercept[IllegalArgumentException](t.createBranch("7"))
    assert(e.getMessage.contains("digits"))
    // mixed names stay fine
    t.createBranch("audit-7")
    assert(t.branches == Seq("audit-7"))
  }
}
