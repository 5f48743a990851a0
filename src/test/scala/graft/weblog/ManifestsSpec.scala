package graft.weblog

import java.nio.file.Files

import org.apache.hadoop.fs.{FSDataOutputStream, Path}

import graft.SparkTestBase

/** A local filesystem whose lock-file creates fail with a GENERIC
  * IOException — the transient-storage-error shape that must NOT be
  * classified as a lost commit race.
  */
class FaultyLockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def create(f: Path, overwrite: Boolean): FSDataOutputStream =
    if (f.getName.endsWith(".lock"))
      throw new java.io.IOException("injected storage failure")
    else super.create(f, overwrite)
}

/** Commit-protocol edge semantics: conflict-vs-IO-error classification
  * on the lock create, and LRU (not wholesale) eviction of the
  * leaf-manifest cache.
  */
class ManifestsSpec extends SparkTestBase {

  private def localFs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a transient IO error on the lock create surfaces as IO, not conflict") {
    val fs = new FaultyLockFs
    fs.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(Files.createTempDirectory("man_faulty").toString)
    val e = intercept[java.io.IOException](
      Manifests.write(fs, dir, 1L, Seq("part-v1-00000.parquet")))
    // the real failure type and message reach the operator — a
    // CommitConflictException here would misdirect them into a retry
    // loop that ends in a bogus "conflict" after 5 attempts
    assert(!e.isInstanceOf[Manifests.CommitConflictException])
    assert(e.getMessage.contains("injected storage failure"))
    // and the writer's tmp debris was cleaned up on the way out
    assert(fs.listStatus(dir).forall(!_.getPath.getName.endsWith(".tmp")))
  }

  test("an existing lock claim still classifies as a lost commit race") {
    val fs = localFs
    val dir = new Path(Files.createTempDirectory("man_conflict").toString)
    fs.create(Manifests.lockPath(dir, 1L), false).close()
    intercept[Manifests.CommitConflictException](
      Manifests.write(fs, dir, 1L, Seq("part-v1-00000.parquet")))
  }

  test("FileEntry round-trips nulls/ndv stamps through the leaf manifest (and legacy lines parse empty)") {
    val fs = localFs
    val dir = new Path(Files.createTempDirectory("man_rt").toString)
    val entries = Seq(
      Manifests.FileEntry("day=1/part-v1-00000.parquet", 123L, 10L,
        Map("k" -> ("1", "9")), nulls = Map("k" -> 3L, "v" -> 0L),
        ndv = Map("k" -> java.util.Base64.getEncoder.encodeToString(
          Array[Byte](1, 2, 3, -5)))),
      Manifests.FileEntry("day=1/part-v1-00001.parquet", 77L, -1L, Map.empty),
      Manifests.FileEntry("day=1/eqdel-v2-00000.parquet", 5L, 2L,
        Map.empty, deleteSeq = 2L))
    val name = s"${Manifests.LeafPrefix}rt_test"
    Manifests.writeLeafManifest(fs, dir, name, entries)
    Manifests.leafCacheClear()
    val back = Manifests.readLeafManifest(fs, dir, name)
    assert(back.sortBy(_.path) == entries.sortBy(_.path),
      s"round trip must be identity:\n$back\nvs\n$entries")
  }

  test("leaf-manifest cache evicts LRU — hot entries survive a cap crossing") {
    val fs = localFs
    val dir = new Path(Files.createTempDirectory("man_lru").toString)
    val oldCap = Manifests.leafCacheMax
    Manifests.leafCacheClear()
    Manifests.leafCacheMax = 8
    try {
      val names = (0 until 20).map(i => f"${Manifests.LeafPrefix}lruspec-$i%03d")
      names.foreach(n => Manifests.writeLeafManifest(fs, dir, n,
        Seq(Manifests.FileEntry(s"event=e/part-$n.parquet", 1L, 1L, Map.empty))))
      // sequential fill crosses the cap: with wholesale clear() the
      // crossing would drop EVERYTHING; with LRU only the coldest go
      names.foreach(n => Manifests.readLeafManifest(fs, dir, n))
      val mark = Manifests.leafManifestReadLog.size()
      names.takeRight(8).foreach(n => Manifests.readLeafManifest(fs, dir, n))
      val tail = Manifests.leafManifestReadLog.toArray.drop(mark).map(_.toString)
      assert(!tail.exists(_.contains("lruspec-")),
        "the 8 most-recent entries must still be cached after the cap crossing")
      // the coldest entry WAS evicted (the cap is enforced at all)
      Manifests.readLeafManifest(fs, dir, names.head)
      assert(Manifests.leafManifestReadLog.toArray.drop(mark)
        .exists(_.toString.contains(names.head)))
    } finally {
      Manifests.leafCacheMax = oldCap
      Manifests.leafCacheClear()
    }
  }
}
