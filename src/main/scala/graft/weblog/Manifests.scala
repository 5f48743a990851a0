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

  /** Publish `_graft_manifest_v<version>` listing the snapshot's files
    * (paths relative to `dir`). Written to a hidden tmp name first, then
    * renamed to the final (new, never-overwritten) name: on HDFS/local,
    * `fs.create` makes a file VISIBLE before its content is flushed, so
    * a direct create would expose an empty/partial manifest — the
    * rename-to-fresh-name publishes it complete; on S3 the equivalent
    * upload is a single atomic PUT.
    */
  def write(fs: FileSystem, dir: Path, version: Long, files: Seq[String]): Unit = {
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$Prefix$version.tmp")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(UTF_8)) finally out.close()
    val fin = new Path(dir, s"$Prefix$version")
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"manifest publish failed: $tmp -> $fin")
  }

  /** All committed versions under `dir`, ascending. */
  def versions(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .flatMap(s => s.getPath.getName.stripPrefix(Prefix).toLongOption
        .filter(_ => s.getPath.getName.startsWith(Prefix)))
      .sorted

  /** The file list committed as `version`, if that manifest exists. */
  def at(fs: FileSystem, dir: Path, version: Long): Option[Seq[String]] = {
    val p = new Path(dir, s"$Prefix$version")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      Some(new String(bytes, UTF_8).split("\n").toSeq.filter(_.nonEmpty))
    }
  }

  /** Newest committed (version, files) under `dir`, if any. */
  def resolve(fs: FileSystem, dir: Path): Option[(Long, Seq[String])] =
    versions(fs, dir).lastOption.flatMap(v => at(fs, dir, v).map(v -> _))

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
      version: Long): Seq[String] = {
    def dataFiles(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (s.isDirectory) dataFiles(s.getPath)
        else Seq(s.getPath)
      }
    val stagingUri = stagingDir.toUri.getPath
    val parts = dataFiles(stagingDir).sortBy(_.toString)
    parts.zipWithIndex.map { case (p, i) =>
      val rel = p.getParent.toUri.getPath.stripPrefix(stagingUri).stripPrefix("/")
      val name = f"part-v$version-$i%05d${suffixOf(p.getName)}"
      val relPath = if (rel.isEmpty) name else s"$rel/$name"
      val dest = new Path(tableRoot, relPath)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(p, dest))
        throw new java.io.IOException(s"import failed: $p -> $dest")
      relPath
    }.toSeq
  }
}
