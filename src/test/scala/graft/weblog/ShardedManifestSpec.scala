package graft.weblog

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The sharded manifest layout (Iceberg's manifest-list → manifest
  * split): the version manifest holds one short `@ref` line per leaf,
  * each referencing an IMMUTABLE per-leaf manifest carrying that leaf's
  * file entries (path, size, row count, column bounds). The property
  * under test: a key-local commit against a wide table rewrites
  * metadata proportional to the leaves it touched — untouched leaves'
  * manifests are re-referenced byte-for-byte, never rewritten.
  */
class ShardedManifestSpec extends SparkTestBase {

  private def leafManifestsOnDisk(t: IcebergLikeTable): Set[String] = {
    val root = new Path(t.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(Manifests.LeafPrefix)).toSet
  }

  test("a 1-leaf upsert re-references every untouched leaf manifest") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("shard_tbl").toString + "/t",
      "event", Seq("user_id"), numBuckets = 8, statsColumns = Seq("user_id"))
    // base load spreads keys over 2 events × 8 buckets = up to 16 leaves
    t.write((0 until 400).map(i =>
        (f"u$i%04d", if (i % 2 == 0) "view" else "click", 1L))
      .toDF("user_id", "event", "seq"), "seq")
    val (_, base) = t.resolveLive()
    assert(base.refs.nonEmpty)
    val nLeaves = base.refs.size
    assert(nLeaves >= 8, s"expected a wide table, got $nLeaves leaves")
    val diskBefore = leafManifestsOnDisk(t)

    // key-local commit: ONE key → one (event, gbucket) leaf rewritten
    t.write(Seq(("u0042", "view", 2L)).toDF("user_id", "event", "seq"), "seq")
    val (_, after) = t.resolveLive()
    assert(after.refs.size == nLeaves, "leaf count unchanged")
    val reused = after.refs.toSet.intersect(base.refs.toSet)
    assert(reused.size == nLeaves - 1,
      s"exactly one leaf manifest may change; reused ${reused.size} of $nLeaves")
    // metadata written by the commit = ONE new leaf manifest file
    val newOnDisk = leafManifestsOnDisk(t) -- diskBefore
    assert(newOnDisk.size == 1,
      s"a 1-leaf commit must write 1 leaf manifest, wrote ${newOnDisk.size}")

    // the version manifest itself carries only @refs — per-file stats
    // live in the leaf manifests, so its size is O(leaves), not O(files)
    val fs = new Path(t.path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = Manifests.snapshotAt(fs, new Path(t.path),
      t.currentVersion.get).get
    assert(raw.files.forall(_.startsWith(Manifests.RefMark)))
    assert(!raw.meta.contains("stats"),
      "per-file stats must not ride in the version manifest")

    // correctness end to end: the upsert landed, everything else intact
    assert(t.read.count() == 400)
    assert(t.read.filter(col("user_id") === "u0042").count() == 1)
  }

  test("entries round-trip size, row count and bounds through the leaf manifests") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("shard_rt").toString + "/t",
      "event", Nil, statsColumns = Seq("n"))
    t.append((0 until 100).map(i => (i.toLong, "e")).toDF("n", "event").coalesce(1))
    t.append((100 until 150).map(i => (i.toLong, "e")).toDF("n", "event").coalesce(1))
    val (_, snap) = t.resolveLive()
    assert(snap.entries.size == 2)
    val byRows = snap.entries.sortBy(_.rowCount)
    assert(byRows.map(_.rowCount) == Seq(50L, 100L))
    assert(snap.entries.forall(_.size > 0L))
    assert(byRows(0).stats("n") == ("100", "149"))
    assert(byRows(1).stats("n") == ("0", "99"))
    // pruning runs off the entry bounds
    assert(t.filesFor(col("n") === 120L).size == 1)
    // append reuses nothing (same leaf changed) but writes exactly one
    // leaf manifest per commit here
    assert(leafManifestsOnDisk(t).size == t.versions.size)
  }

  test("expired leaf manifests are GC'd; shared ones survive their snapshots") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("shard_gc").toString + "/t",
      "event", Nil, retainVersions = 2)
    // each append touches ONLY its own event leaf, so older leaves'
    // manifests are shared across many snapshots
    for (b <- 0 until 5)
      t.append(Seq((b.toLong, s"e$b")).toDF("n", "event").coalesce(1))
    t.vacuum()
    val (_, live) = t.resolveLive()
    // all 5 event leaves are still live — their manifests survive even
    // though the snapshots that WROTE them expired
    assert(live.refs.size == 5)
    assert(t.read.count() == 5)
    // nothing unreferenced on disk
    val referenced = t.versions.flatMap { v =>
      val fs = new Path(t.path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Manifests.snapshotAt(fs, new Path(t.path), v).get.files
        .filter(_.startsWith(Manifests.RefMark)).map(_.stripPrefix(Manifests.RefMark))
    }.toSet
    assert(leafManifestsOnDisk(t) == referenced)
  }

  test("layout drift is rejected at commit; rebucket migrates the table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shard_layout").toString + "/t"
    def rows(ids: Range, v: Long) =
      ids.map(i => (s"k$i", "e", s"h$v", v)).toDF("k", "event", "hostname", "seq")
    val t4 = IcebergLikeTable(spark, dir, "event", Seq("k"), numBuckets = 4)
    t4.write(rows(0 until 40, 1L), "seq")

    // a handle declaring a DIFFERENT bucket count must not be able to
    // commit — its key hashing would route rows into the wrong leaves
    val wrong = IcebergLikeTable(spark, dir, "event", Seq("k"), numBuckets = 8)
    intercept[IllegalArgumentException](wrong.write(rows(40 until 45, 2L), "seq"))
    intercept[IllegalArgumentException](wrong.delete(col("k") === "k0"))
    // reads are layout-agnostic and stay safe
    assert(wrong.read.count() == 40)
    assert(t4.read.count() == 40)

    // rebucket: full rewrite under the new layout, one commit
    val t8 = t4.rebucket(8)
    assert(t8.read.count() == 40)
    // the rewrite actually spread keys over the wider bucket space
    assert(t8.resolveLive()._2.files.exists(f =>
      (4 until 8).exists(b => f.contains(s"gbucket=$b/"))))
    t8.write(rows(40 until 50, 2L), "seq")
    assert(t8.read.count() == 50)
    // upserts still merge correctly post-migration
    t8.write(rows(0 until 5, 3L), "seq")
    assert(t8.read.count() == 50)
    assert(t8.read.filter(col("hostname") === "h3").count() == 5)
    // the OLD handle is now rejected
    intercept[IllegalArgumentException](t4.write(rows(50 until 51, 4L), "seq"))
  }

  test("a conflict-losing commit leaves no leaf-manifest debris; vacuum sweeps crash leftovers") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("shard_debris").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    t.write((0 until 20).map(i => (s"k$i", "e", 1L)).toDF("k", "event", "seq"), "seq")
    // simulate a crashed commit: a leaf manifest written, version CAS
    // never published (the commit's conflict path deletes its own leaf
    // manifests; this is the harder crash-BEFORE-CAS window)
    val root = new Path(t.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Manifests.writeLeafManifest(fs, root, s"${Manifests.LeafPrefix}v99-deadbeef-00000",
      Seq(Manifests.FileEntry("event=e/gbucket=0/part-v99-deadbeef-00000.snappy.parquet",
        1L, 1L, Map.empty)))
    assert(leafManifestsOnDisk(t).exists(_.contains("deadbeef")))
    // readers are unaffected (the debris is referenced by no manifest)
    assert(t.read.count() == 20)
    t.vacuum()
    assert(!leafManifestsOnDisk(t).exists(_.contains("deadbeef")),
      "vacuum must sweep leaf-manifest debris")
    assert(t.read.count() == 20)
  }

  test("legacy monolithic manifests read correctly and migrate on first commit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shard_legacy").toString + "/t"
    val t = IcebergLikeTable(spark, dir, "event", Nil)
    // hand-write a LEGACY manifest: raw file lines, stats in the meta key
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root.getParent, ".legacy_stage")
    (0 until 20).map(i => (i.toLong, "e")).toDF("n", "event")
      .coalesce(1).write.partitionBy("event").parquet(staging.toString)
    val imported = Manifests.importStagedTree(fs, staging, root, 1L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event",
        org.apache.spark.sql.types.StringType)))
    Manifests.write(fs, root, 1L, imported.map(_._1),
      Map("schema" -> schema.json,
        "stats" -> FileStats.toJson(
          Map(imported.head._1 -> Map("n" -> ("0", "19"))))))
    fs.delete(staging, true)

    // legacy read path: files resolve, stats prune, sizes unknown
    assert(t.read.count() == 20)
    assert(t.filesFor(col("n") === 5L).size == 1)
    assert(t.filesFor(col("n") === 999L).isEmpty)
    assert(t.rowCount.isEmpty, "legacy entries carry no row counts")

    // first commit through the library migrates to the sharded layout
    t.append(Seq((100L, "e")).toDF("n", "event").coalesce(1))
    val (_, snap) = t.resolveLive()
    assert(snap.refs.nonEmpty, "commit must publish sharded refs")
    assert(t.read.count() == 21)
  }
}
