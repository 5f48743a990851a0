package graft.weblog

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned-manifest commit protocol shared by the compaction job (C3,
  * per-hour manifests) and [[IcebergLikeTable]] (S10/T3, table-root
  * manifests). The protocol gives readers snapshot isolation on stores
  * with non-atomic rename (S3-style): data files land under
  * version-unique names (dormant — a reader never lists the directory,
  * it resolves a manifest), then ONE manifest file
  * (`_graft_manifest_v<version>`, underscore-hidden from Spark's data
  * listing) is published naming exactly the snapshot's file set — the
  * commit point. A reader that resolved version N keeps a complete,
  * immutable view of N regardless of in-flight writes; the moment
  * version N+1's manifest appears, new readers see all of N+1.
  *
  * Manifests are create-only, so the version chain doubles as table
  * history (time travel, [[IcebergLikeTable.readAt]]); garbage
  * collection is an explicit, retention-bounded step
  * ([[IcebergLikeTable.vacuum]], `Compaction.cleanupStale`) exactly as
  * Iceberg's `expire_snapshots` — the reference declares an Iceberg
  * table whose commits carry these semantics
  * (`web-analytics-iceberg/README.md:183-188`).
  */
object Manifests {

  val Prefix = "_graft_manifest_v"

  /** Name prefix of the immutable PER-LEAF manifest files the table
    * format shards its file metadata into (see [[IcebergLikeTable]]):
    * the version manifest holds `@<name>` reference lines instead of
    * raw file paths, and each referenced leaf manifest lists one leaf
    * partition's data files with their size, row count and column
    * bounds — Iceberg's manifest-list → manifest split. A commit that
    * touches k leaves writes k new leaf manifests and re-references the
    * rest, so commit metadata I/O is O(changed leaves' files), never
    * O(table files).
    */
  val LeafPrefix = "_graft_leafman_"

  /** A reference line in a version manifest pointing at a leaf
    * manifest (vs a legacy raw file path, which never starts with `@`
    * — relative data paths start with a partition segment or `part-`).
    */
  val RefMark = "@"

  /** One file's manifest entry: path relative to the table root, byte
    * size and row count (both stamped at import so planning never lists
    * directories and `count(*)` can resolve from metadata alone;
    * -1 = unknown, from legacy manifests), and the per-column [min,max]
    * bounds used for planning-time file skipping ([[FileStats]]).
    *
    * `deleteSeq` distinguishes EQUALITY-DELETE files (Iceberg v2's
    * merge-on-read delete files) from data files: -1 = a data file;
    * >= 0 = a delete file whose key tuples remove matching rows from
    * data files of the same leaf written at a version STRICTLY BELOW
    * `deleteSeq` (the sequence-number scoping that lets a later upsert
    * re-insert the key without the old tombstone swallowing it).
    */
  /** `nulls`/`ndv` (r11): per-column NULL counts and MERGEABLE
    * DataSketches-HLL sketches (base64 of `hll_sketch_agg` output over
    * the column's string rendering), stamped for the stats columns at
    * import — the native scan unions them across the pruned file set
    * and reports V2 column statistics, so the CBO sees per-column
    * distinct/null counts at plan time without touching data. Absent on
    * legacy manifests (empty maps — per-column refusal, never a guess).
    */
  /** `sums` (r11): per-column EXACT sums of the file's non-null values
    * as plain decimal strings (computed at 38-digit decimal precision —
    * a per-file overflow, or a float/double column, is simply not
    * stamped), for SUM(col) aggregate pushdown: Σ over files is the
    * exact table sum, zero data I/O. "0" on an all-null file — the
    * stamped null counts decide whether the SQL answer is 0 or NULL.
    */
  final case class FileEntry(path: String, size: Long, rowCount: Long,
      stats: Map[String, (String, String)], deleteSeq: Long = -1L,
      nulls: Map[String, Long] = Map.empty,
      ndv: Map[String, String] = Map.empty,
      sums: Map[String, String] = Map.empty) {
    def isDelete: Boolean = deleteSeq >= 0L
  }

  /** Whether a delete-file path is a POSITIONAL delete (rows addressed
    * by (data-file path, row ordinal)) rather than an equality delete
    * (rows addressed by key tuple). The file-name prefix is the kind
    * marker — both import under role-stamped names ([[importStagedTree]]).
    */
  def isPosDelete(path: String): Boolean = {
    val i = path.lastIndexOf('/')
    path.startsWith("posdel-", if (i < 0) 0 else i + 1)
  }

  /** Leaf manifests are immutable (written once under a writer-unique
    * name, never modified), so their parsed content is cached JVM-wide:
    * a hot commit loop re-resolves only the leaf manifests it has not
    * seen — O(changed leaves) reads per snapshot resolution, not
    * O(leaves).
    */
  private val LeafCacheMax = 65536
  private val leafCache: java.util.Map[String, Seq[FileEntry]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Seq[FileEntry]](1024, 0.75f, true) {
        // LRU eviction, one entry at a time: a wholesale clear() at the
        // cap would drop the whole JVM's cache on the insertion that
        // crosses it and force the next resolutions to re-read EVERY
        // leaf manifest — a thundering herd on exactly the biggest
        // tables. Access-ordered LinkedHashMap evicts only the coldest
        // entry, so resolution cost stays O(changed leaves) across a
        // cap-crossing workload.
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Seq[FileEntry]]): Boolean =
          size() > leafCacheMax
      })

  /** Test hook: the leaf-manifest paths actually READ from storage
    * (cache misses), in order. Wraps no production behavior — specs
    * snapshot the size and inspect the tail, keyed by their own paths,
    * so concurrent suites cannot pollute an assertion.
    */
  private[weblog] val leafManifestReadLog =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Test hook: the LRU cap, lowered by specs to exercise eviction
    * without writing 65k manifests. Production never touches it.
    */
  private[weblog] var leafCacheMax: Int = LeafCacheMax

  /** Test hook: reset the JVM-wide cache so an eviction spec starts
    * from a known state.
    */
  private[weblog] def leafCacheClear(): Unit = leafCache.clear()

  private def entryMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Write an immutable leaf manifest (JSONL: one entry per line).
    * Hidden-tmp + rename publish; the name carries the writer token, so
    * two writers can never collide and no CAS is needed — the version
    * manifest's CAS decides which references become live.
    */
  def writeLeafManifest(fs: FileSystem, dir: Path, name: String,
      entries: Seq[FileEntry]): Unit = {
    require(name.startsWith(LeafPrefix), s"not a leaf manifest name: $name")
    val m = entryMapper
    val lines = entries.sortBy(_.path).map { e =>
      val node = m.createObjectNode()
      node.put("p", e.path)
      node.put("s", e.size)
      node.put("r", e.rowCount)
      if (e.isDelete) node.put("q", e.deleteSeq)
      if (e.stats.nonEmpty) {
        val st = node.putObject("t")
        e.stats.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val arr = st.putArray(c); arr.add(lo); arr.add(hi)
        }
      }
      if (e.nulls.nonEmpty) {
        val nl = node.putObject("n")
        e.nulls.toSeq.sortBy(_._1).foreach { case (c, v) => nl.put(c, v) }
      }
      if (e.ndv.nonEmpty) {
        val dv = node.putObject("d")
        e.ndv.toSeq.sortBy(_._1).foreach { case (c, v) => dv.put(c, v) }
      }
      if (e.sums.nonEmpty) {
        val sm = node.putObject("m")
        e.sums.toSeq.sortBy(_._1).foreach { case (c, v) => sm.put(c, v) }
      }
      m.writeValueAsString(node)
    }
    val tmp = new Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(UTF_8))
    finally out.close()
    val fin = new Path(dir, name)
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"leaf manifest publish failed: $fin")
  }

  /** Read (and cache) a leaf manifest's entries. */
  def readLeafManifest(fs: FileSystem, dir: Path, name: String): Seq[FileEntry] = {
    val key = new Path(dir, name).toString
    val cached = leafCache.get(key)
    if (cached != null) return cached
    leafManifestReadLog.add(key)
    val in = fs.open(new Path(dir, name))
    val bytes = try in.readAllBytes() finally in.close()
    val m = entryMapper
    val entries = new String(bytes, UTF_8).split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val node = m.readTree(line)
        val stats =
          if (!node.has("t")) Map.empty[String, (String, String)]
          else {
            val b = Map.newBuilder[String, (String, String)]
            node.get("t").properties().forEach { e =>
              val arr = e.getValue
              if (arr.isArray && arr.size == 2)
                b += e.getKey -> (arr.get(0).asText, arr.get(1).asText)
            }
            b.result()
          }
        val nulls =
          if (!node.has("n")) Map.empty[String, Long]
          else {
            val b = Map.newBuilder[String, Long]
            node.get("n").properties().forEach(e =>
              b += e.getKey -> e.getValue.asLong)
            b.result()
          }
        val ndv =
          if (!node.has("d")) Map.empty[String, String]
          else {
            val b = Map.newBuilder[String, String]
            node.get("d").properties().forEach(e =>
              b += e.getKey -> e.getValue.asText)
            b.result()
          }
        val sums =
          if (!node.has("m")) Map.empty[String, String]
          else {
            val b = Map.newBuilder[String, String]
            node.get("m").properties().forEach(e =>
              b += e.getKey -> e.getValue.asText)
            b.result()
          }
        FileEntry(node.get("p").asText, node.get("s").asLong,
          node.get("r").asLong, stats,
          if (node.has("q")) node.get("q").asLong else -1L,
          nulls, ndv, sums)
      }
    leafCache.put(key, entries)
    entries
  }

  /** A committed snapshot: its data files plus the key→value metadata
    * stamped at commit (`schema` = the table schema as StructType JSON,
    * resolved at read planning instead of O(files) parquet footers;
    * `hwm.<stream>` = per-stream append high-water marks for
    * exactly-once micro-batch replay). Metadata lines serialize as
    * `#key=value` ahead of the file list; manifests written before the
    * header existed parse with empty meta.
    */
  final case class Snapshot(files: Seq[String], meta: Map[String, String])

  /** A concurrent writer published (or is publishing) this version
    * first — the optimistic-concurrency lost-race signal. Callers
    * re-resolve the live snapshot, redo their merge against it, and
    * retry ([[graft.weblog.IcebergLikeTable]] does this automatically).
    */
  final class CommitConflictException(msg: String)
    extends java.io.IOException(msg)

  /** Publish `_graft_manifest_v<version>` listing the snapshot's files
    * (paths relative to `dir`) plus the metadata header. Written to a
    * hidden tmp name first, then renamed to the final (new,
    * never-overwritten) name: on HDFS/local, `fs.create` makes a file
    * VISIBLE before its content is flushed, so a direct create would
    * expose an empty/partial manifest — the rename-to-fresh-name
    * publishes it complete; on S3 the equivalent upload is a single
    * atomic PUT.
    *
    * Optimistic-concurrency guard: the version name is claimed FIRST via
    * a create-if-absent lock file (`.<manifest>.lock`) — the atomic
    * primitive every store has (O_EXCL create locally, conditional PUT
    * on S3). Two writers that raced from the same base version compute
    * the same next version, so exactly one claim succeeds; the loser
    * gets [[CommitConflictException]] and must re-resolve + retry its
    * merge — no lost update. The lock is deleted after the rename; a
    * lock left by a writer that crashed pre-publish is debris that
    * [[IcebergLikeTable.vacuum]] sweeps (locks with no published
    * manifest).
    */
  def write(fs: FileSystem, dir: Path, version: Long, files: Seq[String],
      meta: Map[String, String] = Map.empty): Unit =
    write(fs, dir, version, files, meta, Prefix)

  /** As above under an explicit name prefix — version chains other than
    * the main one (snapshot BRANCHES) publish through the same
    * create-only CAS protocol with their own prefix.
    */
  def write(fs: FileSystem, dir: Path, version: Long, files: Seq[String],
      meta: Map[String, String], prefix: String): Unit = {
    fs.mkdirs(dir)
    meta.foreach { case (k, v) =>
      require(!k.contains('\n') && !k.contains('=') && !v.contains('\n'),
        s"manifest meta key/value must be single-line, '='-free key: $k")
    }
    val fin = new Path(dir, s"$prefix$version")
    if (fs.exists(fin))
      throw new CommitConflictException(
        s"version $version already committed under $dir")
    // per-writer tmp name: racing writers target the SAME version, so a
    // shared tmp would let one truncate the other's in-flight content
    val tmp = new Path(dir,
      s".$prefix$version.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val header = meta.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" }
    val out = fs.create(tmp, true)
    try out.write((header ++ files).mkString("\n").getBytes(UTF_8))
    finally out.close()
    val lock = lockPath(dir, version, prefix)
    // lost-race vs transient-IO classification: ONLY an already-exists
    // failure on the create-if-absent means another writer holds the
    // claim. A generic IOException (storage blip, permission, quota)
    // must surface AS an IO error — classifying it as a conflict would
    // misdirect the operator into a retry loop that ends in a bogus
    // CommitConflictException. The fs.exists fallback covers stores
    // whose conditional-create reports an existing object with a
    // store-specific IOException subtype.
    val claimed = try { fs.create(lock, false).close(); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException =>
        if (try fs.exists(lock) catch { case _: java.io.IOException => false })
          false
        else { fs.delete(tmp, false); throw e }
    }
    if (!claimed) {
      fs.delete(tmp, false)
      throw new CommitConflictException(
        s"lost commit race for version $version under $dir")
    }
    // we own the claim from here: publish, then release. Re-check the
    // final name under the lock — a writer that published this version
    // and already released its lock must still lose us the race (rename
    // on a local fs would otherwise silently overwrite).
    try {
      if (fs.exists(fin)) {
        fs.delete(tmp, false)
        throw new CommitConflictException(
          s"version $version published concurrently under $dir")
      }
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(s"manifest publish failed: $tmp -> $fin")
    } finally fs.delete(lock, false)
  }

  private[weblog] def lockPath(dir: Path, version: Long,
      prefix: String = Prefix): Path =
    new Path(dir, s".$prefix$version.lock")

  /** All committed versions under `dir`, ascending. */
  def versions(fs: FileSystem, dir: Path): Seq[Long] = versions(fs, dir, Prefix)

  /** Committed versions of an explicit chain prefix, ascending. */
  def versions(fs: FileSystem, dir: Path, prefix: String): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .flatMap(s => s.getPath.getName.stripPrefix(prefix).toLongOption
        .filter(_ => s.getPath.getName.startsWith(prefix)))
      .sorted

  /** The file list committed as `version`, if that manifest exists. */
  def at(fs: FileSystem, dir: Path, version: Long): Option[Seq[String]] =
    snapshotAt(fs, dir, version).map(_.files)

  /** The full snapshot (files + metadata) committed as `version`. */
  def snapshotAt(fs: FileSystem, dir: Path, version: Long): Option[Snapshot] =
    snapshotAt(fs, dir, version, Prefix)

  /** As above for an explicit chain prefix. */
  def snapshotAt(fs: FileSystem, dir: Path, version: Long,
      prefix: String): Option[Snapshot] = {
    val p = new Path(dir, s"$prefix$version")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val lines = new String(bytes, UTF_8).split("\n").toSeq.filter(_.nonEmpty)
      val (header, files) = lines.partition(_.startsWith("#"))
      val meta = header.map { l =>
        val kv = l.stripPrefix("#")
        val i = kv.indexOf('=')
        kv.take(i) -> kv.drop(i + 1)
      }.toMap
      Some(Snapshot(files, meta))
    }
  }

  /** Newest committed (version, files) under `dir`, if any. */
  def resolve(fs: FileSystem, dir: Path): Option[(Long, Seq[String])] =
    resolveSnapshot(fs, dir).map { case (v, s) => (v, s.files) }

  /** Newest committed (version, snapshot) under `dir`, if any. */
  def resolveSnapshot(fs: FileSystem, dir: Path): Option[(Long, Snapshot)] =
    versions(fs, dir).lastOption.flatMap(v => snapshotAt(fs, dir, v).map(v -> _))

  private def suffixOf(name: String): String = {
    val i = name.indexOf('.')
    if (i < 0) ".parquet" else name.substring(i)
  }

  /** Move a flat staging directory's part-files into `destDir` under
    * version-unique names (never colliding with any live version's
    * names). Each move is an atomic single-object operation; the files
    * are dormant until a manifest references them. Returns the new names.
    */
  def importStaged(fs: FileSystem, stagingDir: Path, destDir: Path,
      version: Long): Seq[String] = {
    fs.mkdirs(destDir)
    val parts = fs.listStatus(stagingDir)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    parts.zipWithIndex.map { case (s, i) =>
      val name = f"part-v$version-$i%05d${suffixOf(s.getPath.getName)}"
      if (!fs.rename(s.getPath, new Path(destDir, name)))
        throw new java.io.IOException(s"import failed: ${s.getPath} -> $destDir/$name")
      name
    }.toSeq
  }

  /** Move a PARTITIONED staging tree's part-files into the same relative
    * leaf directories under `tableRoot`, version-unique names as above.
    * Returns the imported files' paths relative to `tableRoot`
    * (e.g. `event=view/gbucket=3/part-v17-00002.snappy.parquet`).
    */
  def importStagedTree(fs: FileSystem, stagingDir: Path, tableRoot: Path,
      version: Long): Seq[(String, Long)] =
    importStagedTree(fs, stagingDir, tableRoot, s"v$version")

  /** As above with an explicit name token: optimistic-concurrency
    * writers racing from the same base version stage under the SAME next
    * version, so the imported (dormant) file names need a per-writer
    * token to stay collision-free — the manifest CAS, not the import,
    * decides the winner; the loser's files are unreferenced debris that
    * [[IcebergLikeTable.vacuum]] sweeps. Returns (relative path, byte
    * size) per imported file — the size is captured from the staging
    * listing the walk already made, so stamping it into the manifest
    * costs zero extra round trips.
    */
  def importStagedTree(fs: FileSystem, stagingDir: Path, tableRoot: Path,
      nameToken: String): Seq[(String, Long)] =
    importStagedTree(fs, stagingDir, tableRoot, nameToken, "part")

  /** As above with an explicit file-name prefix: equality-DELETE files
    * import under `eqdel-` and positional-delete files under `posdel-`
    * so a directory listing distinguishes them from data files at a
    * glance (the manifest entry's `deleteSeq` is the authoritative
    * delete marker; the name distinguishes the two delete KINDS and
    * keeps the data-file name grammar — `part-v<version>-…`, whose
    * embedded version IS the file's write sequence — unpolluted).
    */
  def importStagedTree(fs: FileSystem, stagingDir: Path, tableRoot: Path,
      nameToken: String, namePrefix: String): Seq[(String, Long)] = {
    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (s.isDirectory) dataFiles(s.getPath)
        else Seq(s)
      }
    val stagingUri = stagingDir.toUri.getPath
    val parts = dataFiles(stagingDir).sortBy(_.getPath.toString)
    parts.zipWithIndex.map { case (s, i) =>
      val p = s.getPath
      val rel = p.getParent.toUri.getPath.stripPrefix(stagingUri).stripPrefix("/")
      val name = f"$namePrefix-$nameToken-$i%05d${suffixOf(p.getName)}"
      val relPath = if (rel.isEmpty) name else s"$rel/$name"
      val dest = new Path(tableRoot, relPath)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(p, dest))
        throw new java.io.IOException(s"import failed: $p -> $dest")
      relPath -> s.getLen
    }.toSeq
  }
}
