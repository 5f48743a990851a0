package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Manifest-stamped per-file column bounds + planning-time file
  * skipping ([[FileStats]], [[IcebergLikeTable.readWhere]]): appends
  * with disjoint value ranges produce files a predicate can prove
  * empty, and readWhere must drop exactly those — while staying
  * row-identical to read.filter for every predicate shape, including
  * the ones stats cannot decide.
  */
class IcebergStatsSpec extends SparkTestBase {

  private def tmpTable(): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory("stats_tbl").toString + "/t",
      "event", Nil, statsColumns = Seq("n", "user_id"))

  /** 5 append batches, batch b carrying n ∈ [b·100, b·100+99] and
    * zero-padded user ids "u0000".."u0499" — one file per batch in the
    * single `event=e` leaf, disjoint bounds per file.
    */
  private def loaded(): IcebergLikeTable = {
    import spark.implicits._
    val t = tmpTable()
    for (b <- 0 until 5) {
      val df = (b * 100 until (b + 1) * 100)
        .map(i => (i.toLong, f"u$i%04d", "e"))
        .toDF("n", "user_id", "event")
        .coalesce(1)
      t.append(df)
    }
    t
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("equality, range, OR and IN predicates prune to the covering files") {
    val t = loaded()
    val all = t.filesFor(lit(true))
    assert(all.size == 5)

    assert(t.filesFor(col("n") === 250).size == 1)
    assert(t.filesFor(col("n") > 450).size == 1)
    assert(t.filesFor(col("n") >= 100 && col("n") < 300).size == 2)
    assert(t.filesFor(col("n") === 50 || col("n") === 450).size == 2)
    assert(t.filesFor(col("n").isin(150, 350)).size == 2)
    assert(t.filesFor(lit(250) === col("n")).size == 1)
    // string bounds compare as UTF-8 bytes
    assert(t.filesFor(col("user_id") === "u0250").size == 1)
    assert(t.filesFor(col("user_id") > "u0449").size == 1)
    // a provably-empty predicate scans zero files
    assert(t.filesFor(col("n") === 9999).isEmpty)
    // undecidable shapes keep everything (sound)
    assert(t.filesFor(col("n") % 2 === 0).size == 5)
    assert(t.filesFor(!(col("n") === 250)).size == 5)
  }

  test("readWhere is row-identical to read.filter and scans fewer files") {
    val t = loaded()
    for (cond <- Seq(col("n") === 250, col("n") >= 100 && col("n") < 300,
        col("user_id") === "u0042", col("n") % 2 === 0, col("n") === 9999)) {
      sameRows(t.readWhere(cond), t.read.filter(cond))
    }
    assert(t.readWhere(col("n") === 250).inputFiles.length == 1)
    assert(t.read.filter(col("n") === 250).inputFiles.length == 5)
    assert(t.readWhere(col("n") === 9999).count() == 0)
  }

  test("stats survive carry-over commits and rewrites recompute them") {
    import spark.implicits._
    val t = loaded()
    // another append: the 5 prior files' stats carry over untouched
    t.append(Seq((900L, "u0900", "e")).toDF("n", "user_id", "event").coalesce(1))
    assert(t.filesFor(col("n") === 250).size == 1)
    assert(t.filesFor(col("n") === 900).size == 1)
    // maintain() compacts the 6-file leaf into one file whose recomputed
    // bounds span everything — pruning keeps exactly that file
    assert(t.maintain(fileThreshold = 2, targetFiles = 1).nonEmpty)
    assert(t.filesFor(lit(true)).size == 1)
    assert(t.filesFor(col("n") === 250).size == 1)
    assert(t.filesFor(col("n") === 9999).isEmpty)
    sameRows(t.readWhere(col("n") === 250), t.read.filter(col("n") === 250))
    assert(t.read.count() == 501)
  }

  test("keyed tables: sound under hash bucketing, out-of-range lookups prune all") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stats_keyed").toString + "/t",
      "event", Seq("user_id"), numBuckets = 4)
    val base = (0 until 200)
      .map(i => (f"u$i%04d", "e", 1L))
      .toDF("user_id", "event", "seq")
    t.write(base, "seq")
    val all = t.filesFor(lit(true))
    assert(all.size == 4)
    // hash bucketing spreads keys uniformly, so every bucket file's
    // [min,max] spans ~the full key range and a mid-range point lookup
    // cannot min/max-prune — that lookup's file cut is gbucket PARTITION
    // pruning inside the scan (the hash is recomputable from the key);
    // stats must merely stay sound here
    val hit = t.filesFor(col("user_id") === "u0042")
    assert(hit.size == all.size)
    sameRows(t.readWhere(col("user_id") === "u0042"),
      t.read.filter(col("user_id") === "u0042"))
    // an out-of-range key is provably absent from every file's bounds:
    // planning-time prune to ZERO files, no scan at all
    sameRows(t.readWhere(col("user_id") === "zzzz"),
      t.read.filter(col("user_id") === "zzzz"))
    assert(t.readWhere(col("user_id") === "zzzz").count() == 0)
    assert(t.filesFor(col("user_id") === "zzzz").isEmpty)
  }

  test("range-clustered append makes point predicates prune to one file") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stats_clustered").toString + "/t",
      "event", Nil, statsColumns = Seq("n"))
    val df = (0 until 1000).map(i => (i.toLong, "e")).toDF("n", "event")
    t.appendClustered(df, Seq("n"), nFiles = 8)
    val all = t.filesFor(lit(true))
    assert(all.size == 8)
    // non-overlapping range slices: a point predicate covers exactly one
    assert(t.filesFor(col("n") === 500).size == 1)
    // a narrow range predicate covers 1-2 adjacent slices, never all
    assert(t.filesFor(col("n") >= 100 && col("n") <= 150).size <= 2)
    sameRows(t.readWhere(col("n") === 500), t.read.filter(col("n") === 500))
    assert(t.read.count() == 1000)
    // contrast: the same rows appended unclustered from 8 hash tasks
    // span the domain per file — the point predicate prunes nothing
    val u = IcebergLikeTable(spark,
      Files.createTempDirectory("stats_unclustered").toString + "/t",
      "event", Nil, statsColumns = Seq("n"))
    u.append(df.repartition(8))
    assert(u.filesFor(col("n") === 500).size == u.filesFor(lit(true)).size)
    // ...until CLUSTERED maintenance compacts the leaf with a sort
    // order: the rewritten files get sharp, non-overlapping bounds and
    // point predicates prune again
    assert(u.maintainClustered(Seq("n"), fileThreshold = 2, targetFiles = 4).nonEmpty)
    val after = u.filesFor(lit(true))
    assert(after.size >= 2)
    assert(u.filesFor(col("n") === 500).size == 1)
    sameRows(u.readWhere(col("n") === 500), u.read.filter(col("n") === 500))
    assert(u.read.count() == 1000)
  }

  test("bloom sidecars prune point lookups that min/max cannot") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("bloom_tbl").toString + "/t",
      "event", Nil, statsColumns = Seq("n"),
      bloomColumns = Seq("user_id"), bloomExpectedItems = 1000L)
    // each batch holds ids spread across the WHOLE id range (id % 5 == b)
    // — every file's [min,max] box spans the domain, interval pruning
    // keeps all 5; only the bloom knows which file holds a given id
    for (b <- 0 until 5) {
      val df = (0 until 500).filter(_ % 5 == b)
        .map(i => (i.toLong, f"u$i%04d", "e"))
        .toDF("n", "user_id", "event").coalesce(1)
      t.append(df)
    }
    assert(t.filesFor(lit(true)).size == 5)
    // n=42 is in batch 2 (42 % 5 = 2): interval prune keeps all 5 files
    // (each file spans ~[b, 495+b]), the bloom cuts to its file (+fp)
    val hit = t.filesFor(col("user_id") === "u0042")
    assert(hit.size <= 2, s"bloom should prune, got $hit")
    assert(hit.nonEmpty)
    sameRows(t.readWhere(col("user_id") === "u0042"),
      t.read.filter(col("user_id") === "u0042"))
    assert(t.readWhere(col("user_id") === "u0042").count() == 1)
    // absent key: every bloom answers no — zero files at planning time
    assert(t.filesFor(col("user_id") === "zzzz").isEmpty)
    // IN lists get the same treatment per element
    assert(t.filesFor(col("user_id").isin("u0042", "u0043")).size <= 4)
    sameRows(t.readWhere(col("user_id").isin("u0042", "u0043")),
      t.read.filter(col("user_id").isin("u0042", "u0043")))
    // range predicates never consult the bloom (sound fallthrough)
    assert(t.filesFor(col("user_id") >= "u0000").size == 5)
    // combined: bloom point cut AND interval cut compose under AND
    assert(t.filesFor(col("user_id") === "u0042" && col("n") === 9999L).isEmpty)
  }

  test("bloom sidecar files are reference-tracked and GC'd with snapshots") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bloom_gc").toString + "/t"
    val t = IcebergLikeTable(spark, dir, "event", Nil,
      bloomColumns = Seq("user_id"), bloomExpectedItems = 100L,
      retainVersions = 2)
    for (b <- 0 until 5)
      t.append(Seq((b.toLong, s"u$b", "e")).toDF("n", "user_id", "event").coalesce(1))
    t.vacuum()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecarsOnDisk = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_graft_bloom_")).toSet
    // every sidecar on disk is referenced by a retained manifest, and
    // the retained snapshots' lookups still work end to end
    val referenced = t.versions
      .flatMap(v => Manifests.snapshotAt(fs, new org.apache.hadoop.fs.Path(dir), v))
      .flatMap(s => s.meta.get("bloomfiles").toSeq.flatMap(_.split(",")))
      .toSet
    assert(sidecarsOnDisk == referenced.filter(_.nonEmpty))
    assert(t.filesFor(col("user_id") === "u4").size == 1)
    assert(t.filesFor(col("user_id") === "nope").isEmpty)
    assert(t.read.count() == 5)
  }

  test("delete rewrites only the stats/bloom-candidate files") {
    import spark.implicits._
    // clustered layout: 8 files with disjoint n-ranges, so a point
    // delete has exactly one candidate file
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stats_delete").toString + "/t",
      "event", Nil, statsColumns = Seq("n"))
    val df = (0 until 1000).map(i => (i.toLong, "e")).toDF("n", "event")
    t.appendClustered(df, Seq("n"), nFiles = 8)
    val before = t.filesFor(lit(true)).toSet
    val candidates = t.filesFor(col("n") === 500L).toSet
    assert(candidates.size == 1)
    assert(t.delete(col("n") === 500L) == 1L)
    val after = t.filesFor(lit(true)).toSet
    // every non-candidate file carried over BY REFERENCE (same name) —
    // the discovery scan composed the table's own file skipping, so the
    // rewrite never touched them
    assert((before -- candidates).subsetOf(after),
      "non-candidate files must carry over under their exact names")
    assert((after -- before).size <= 1, "only the hit file is rewritten")
    assert(!after.exists(candidates.contains),
      "the hit file must leave the manifest")
    assert(t.read.count() == 999)
    assert(t.read.filter(col("n") === 500L).count() == 0)

    // bloom candidates bound the same way for a hash-spread layout
    val b = IcebergLikeTable(spark,
      Files.createTempDirectory("bloom_delete").toString + "/t",
      "event", Nil, bloomColumns = Seq("user_id"), bloomExpectedItems = 1000L)
    for (k <- 0 until 5) {
      val part = (0 until 500).filter(_ % 5 == k)
        .map(i => (i.toLong, f"u$i%04d", "e"))
        .toDF("n", "user_id", "event").coalesce(1)
      b.append(part)
    }
    val bBefore = b.filesFor(lit(true)).toSet
    val bCand = b.filesFor(col("user_id") === "u0042").toSet
    assert(bCand.size <= 2)
    assert(b.delete(col("user_id") === "u0042") == 1L)
    val bAfter = b.filesFor(lit(true)).toSet
    assert((bBefore -- bCand).subsetOf(bAfter))
    assert(b.read.count() == 499)
  }

  test("predicate pruning composes with time travel") {
    val t = loaded()
    val v1 = t.currentVersion.get
    import spark.implicits._
    // a later append extends the live range; the historical snapshot
    // must still prune within ITS OWN manifest stamps
    t.append(Seq((900L, "u0900", "e")).toDF("n", "user_id", "event").coalesce(1))
    sameRows(t.readWhereAt(v1, col("n") === 250),
      t.readAt(v1).filter(col("n") === 250))
    assert(t.readWhereAt(v1, col("n") === 250).inputFiles.length == 1)
    assert(t.readWhereAt(v1, col("n") === 900).count() == 0)
    assert(t.readWhere(col("n") === 900).count() == 1)
  }

  test("float bounds round-trip exactly — 0.1f point lookups never lose rows") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stats_float").toString + "/t",
      "event", Nil, statsColumns = Seq("f"))
    // shortest-round-trip float strings ("0.1") parse to a DIFFERENT
    // real as doubles (0.1f != 0.1d) — the bound compare must go back
    // through Float or a single-value file gets pruned unsoundly
    // 0.1f is file 1's MAX: under a double-parsed bound the interval
    // check reads [_, 0.1d] with 0.1d < (0.1f as double) and drops the
    // file — the exact unsound case
    t.append(Seq((0.05f, "e"), (0.1f, "e")).toDF("f", "event").coalesce(1))
    t.append(Seq((0.7f, "e"), (0.9f, "e")).toDF("f", "event").coalesce(1))
    assert(t.filesFor(lit(0.1f) === col("f")).size == 1)
    sameRows(t.readWhere(col("f") === 0.1f), t.read.filter(col("f") === 0.1f))
    assert(t.readWhere(col("f") === 0.1f).count() == 1)
    assert(t.readWhere(col("f") > 0.1f && col("f") < 0.8f).count() == 1)
  }

  test("all-null stat columns, missing columns and legacy manifests never prune") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stats_null").toString + "/t",
      "event", Nil, statsColumns = Seq("maybe"))
    t.append(Seq((1L, "e")).toDF("n", "event")
      .withColumn("maybe", lit(null).cast("string")).coalesce(1))
    // the only file has an all-null stats column: no bounds, no pruning
    assert(t.filesFor(col("maybe") === "x").size == 1)
    sameRows(t.readWhere(col("maybe") === "x"),
      t.read.filter(col("maybe") === "x"))
    // predicates on unstamped columns keep everything
    assert(t.filesFor(col("n") === 999).size == 1)
  }
}
