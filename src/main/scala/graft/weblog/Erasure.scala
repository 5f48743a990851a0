package graft.weblog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end GDPR user erasure across all three storage zones (the
  * reference keeps raw JSON, compacted parquet, and an Iceberg table of
  * the same events — a right-to-be-forgotten request must reach all
  * three; the reference itself ships no erasure tooling, so the
  * semantics here follow Iceberg's copy-on-write row-level DELETE).
  *
  * Zone mechanics differ by format:
  *
  *  - RAW zone (hive-hour JSON-lines, S7): affected FILES are discovered
  *    with one distributed scan (only file names return to the driver —
  *    a GDPR request touches the hours one user was active, so the list
  *    is bounded), then each affected file is rewritten copy-on-write IN
  *    PLACE by an executor task: surviving lines go to a dot-hidden temp
  *    sibling (invisible to Spark's listing), which then replaces the
  *    original under the SAME name — a PUT-overwrite on object stores
  *    (atomic per object), a delete+rename on HDFS/local. Keeping the
  *    name means concurrent listers never see a changed file set.
  *
  *  - COMPACTED zone (manifest-committed parquet hours, C1/C3): each
  *    affected hour is rewritten through the SAME staged-import +
  *    versioned-manifest commit as compaction itself — manifest readers
  *    see complete-old or complete-new, never partial; re-compacting an
  *    hour later is unaffected (it supersedes the erasure version like
  *    any other commit).
  *
  *  - ICEBERG-like table (S10): delegates to the table's own row-level
  *    [[IcebergLikeTable.delete]] (leaf-scoped copy-on-write rewrite,
  *    snapshot-committed, CDC-visible).
  *
  * Scale: both discoveries are full scans of the zone (unavoidable — the
  * user can appear in any hour), but they shuffle only file names /
  * leaf paths; rewrite cost is proportional to the user's activity
  * footprint, not the zone size. Erasure jobs batch many user ids into
  * one sweep for exactly this reason — `userIds` is a set.
  */
object Erasure {

  final case class ZoneReport(affectedUnits: Long, erasedRows: Long)
  final case class SweepReport(raw: ZoneReport, compacted: ZoneReport,
      table: ZoneReport)

  /** JSON-line predicate: does this raw payload belong to one of the
    * erased users? Missing/other field values never match (erasure must
    * not over-delete).
    */
  private def rawMatch(userField: String, userIds: Set[String]): Column = {
    val u = get_json_object(col("value"), s"$$.$userField")
    u.isNotNull && u.isin(userIds.toSeq: _*)
  }

  /** Executor-side twin of [[rawMatch]]: extract the user field with
    * Jackson (on Spark's classpath) — `None` for non-JSON lines or
    * non-string fields, so they are always kept.
    */
  private def userOf(mapper: com.fasterxml.jackson.databind.ObjectMapper,
      field: String, line: String): Option[String] =
    try {
      val node = mapper.readTree(line)
      Option(node).map(_.get(field)).filter(f => f != null && f.isTextual)
        .map(_.asText)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Erase `userIds` from the raw JSON-lines zone. Returns affected file
    * count and erased line count.
    */
  def eraseRaw(spark: SparkSession, rawPath: String, userIds: Set[String],
      userField: String = "user_id"): ZoneReport = {
    require(userIds.nonEmpty, "no user ids to erase")
    val lines = spark.read
      .option("recursiveFileLookup", "true")
      .textFile(rawPath)
      .toDF("value")
    val hit = rawMatch(userField, userIds)
    // one distributed scan; only (file name, match count) rows collect
    val affected = lines
      .groupBy(input_file_name().as("file"))
      .agg(sum(when(hit, 1L).otherwise(0L)).as("matches"))
      .filter(col("matches") > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val erased = affected.map(_._2).sum
    if (affected.nonEmpty) {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      val field = userField
      val ids = userIds
      // per-file copy-on-write rewrite, distributed over executor tasks
      spark.sparkContext
        .parallelize(affected.map(_._1).toSeq, math.min(affected.length, 32))
        .foreach { uri =>
          val path = new Path(new java.net.URI(uri))
          val fs = path.getFileSystem(conf.value)
          val tmp = new Path(path.getParent, s".erase_${path.getName}")
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(path), java.nio.charset.StandardCharsets.UTF_8))
          val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
          try {
            var line = in.readLine()
            while (line != null) {
              if (!userOf(mapper, field, line).exists(ids.contains)) {
                out.write(line); out.newLine()
              }
              line = in.readLine()
            }
          } finally { in.close(); out.close() }
          // replace under the SAME name: a PUT-overwrite on object
          // stores. Where rename won't clobber (HDFS/local), park the
          // original under a dot-hidden backup first so no crash
          // window can LOSE data: worst case the file is temporarily
          // absent from listings, with both copies still on disk.
          val backup = new Path(path.getParent, s".pre_erase_${path.getName}")
          fs.delete(backup, false)
          if (!fs.rename(path, backup))
            throw new java.io.IOException(s"erasure backup failed for $path")
          if (!fs.rename(tmp, path)) {
            fs.rename(backup, path) // restore; the rewrite is retryable
            throw new java.io.IOException(s"erasure rename failed for $path")
          }
          fs.delete(backup, false)
        }
    }
    ZoneReport(affected.length.toLong, erased)
  }

  /** The compacted zone's LIVE data files: every leaf directory's
    * manifest-resolved file set ([[Manifests.resolve]]), falling back to
    * the leaf's plain parquet listing where no manifest was ever
    * committed (a zone written without the compaction protocol). One
    * driver-side walk, O(leaves) metadata round trips — the same cost
    * the per-leaf rewrite loop already pays.
    */
  private def liveLeafFiles(fs: org.apache.hadoop.fs.FileSystem,
      zoneRoot: Path): Seq[String] = {
    if (!fs.exists(zoneRoot)) return Nil
    def walk(p: Path): Seq[Path] = {
      val children = fs.listStatus(p).toSeq
      val dirs = children.filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(s => walk(s.getPath))
    }
    walk(zoneRoot).flatMap { leaf =>
      Manifests.resolve(fs, leaf) match {
        case Some((_, files)) => files.map(f => new Path(leaf, f).toString)
        case None => fs.listStatus(leaf).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString)
      }
    }
  }

  /** Erase `userIds` from the compacted parquet zone: discover affected
    * hour leaves with one distributed scan, then rewrite each through
    * the compaction manifest-commit protocol (staged import → versioned
    * manifest → GC). Returns affected leaf count and erased row count.
    */
  def eraseCompacted(spark: SparkSession, parquetPath: String,
      userIds: Set[String], userField: String = "user_id",
      targetFiles: Int = 1): ZoneReport = {
    require(userIds.nonEmpty, "no user ids to erase")
    val fs = new Path(parquetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // discover over the MANIFEST-RESOLVED file set per leaf (the same
    // resolution the rewrite uses): a recursive directory listing would
    // also read superseded, dormant files no manifest references, and
    // the compliance report would count rows that were already
    // logically deleted
    val liveFiles = liveLeafFiles(fs, new Path(parquetPath))
    if (liveFiles.isEmpty) return ZoneReport(0L, 0L)
    val df = spark.read.parquet(liveFiles: _*)
    val hit = col(userField).isNotNull && col(userField).isin(userIds.toSeq: _*)
    val affected = df
      .groupBy(regexp_replace(input_file_name(), "/[^/]*$", "").as("leaf"))
      .agg(sum(when(hit, 1L).otherwise(0L)).as("matches"))
      .filter(col("matches") > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    affected.foreach { case (leafUri, _) =>
      val destDir = new Path(new java.net.URI(leafUri))
      val survivors = Manifests.resolve(fs, destDir) match {
        case Some((_, files)) =>
          spark.read.parquet(files.map(f => new Path(destDir, f).toString): _*)
        case None => spark.read.parquet(destDir.toString)
      }
      // DELETE semantics: erase rows where the membership test is TRUE;
      // a NULL user field evaluates the isin to NULL, and a bare `!`
      // would silently drop those bystander rows — the exact guard
      // IcebergLikeTable.delete documents
      val kept = survivors.filter(
        !coalesce(col(userField).isin(userIds.toSeq: _*), lit(false)))
      val staging = new Path(destDir.getParent, s".erase_${destDir.getName}")
      fs.delete(staging, true)
      kept.repartition(targetFiles)
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(staging.toString)
      val version = math.max(System.nanoTime(),
        Manifests.resolve(fs, destDir).map(_._1 + 1L).getOrElse(0L))
      val files = Manifests.importStaged(fs, staging, destDir, version)
      Manifests.write(fs, destDir, version, files)
      Compaction.cleanupStale(fs, destDir)
      fs.delete(staging, true)
    }
    ZoneReport(affected.length.toLong, affected.map(_._2).sum)
  }

  /** The full three-zone sweep: raw JSON, compacted parquet, and the
    * Iceberg-like table, in that order (upstream zones first, so a
    * crash-and-rerun can only leave the user in zones the sweep will
    * reach again — re-running is idempotent in every zone).
    */
  def eraseUser(spark: SparkSession, rawPath: String, parquetPath: String,
      table: IcebergLikeTable, userIds: Set[String],
      userField: String = "user_id"): SweepReport =
    eraseUser(spark, rawPath, parquetPath, table, userIds, userField,
      immediate = false)

  /** As above; `immediate = true` additionally collapses the table's
    * snapshot history to the live (post-delete) version and sweeps the
    * expired files — the rows are physically gone NOW, not after the
    * retention window (Iceberg's delete + expire_snapshots run
    * back-to-back). The cost is losing time travel across the erasure
    * point, which is exactly what a hard GDPR erasure requires; the
    * raw and compacted zones keep no history, so they are always
    * immediate.
    */
  def eraseUser(spark: SparkSession, rawPath: String, parquetPath: String,
      table: IcebergLikeTable, userIds: Set[String],
      userField: String, immediate: Boolean): SweepReport = {
    val raw = eraseRaw(spark, rawPath, userIds, userField)
    val compacted = eraseCompacted(spark, parquetPath, userIds, userField)
    val cond = col(userField).isin(userIds.toSeq: _*)
    // the table AND every branch: a branch is an independent snapshot
    // chain referencing its own file set — erasing main alone would
    // leave the user's rows readable through the branch
    val erased = table.delete(cond) +
      table.branches.map(b => table.forBranch(b).delete(cond)).sum
    if (immediate) {
      // TAGS pin snapshots past retention (expireSnapshots never expires
      // a tagged version), so a tag created before this sweep would keep
      // the erased user's rows readable via readTag/readAt indefinitely
      // while SweepReport claims the purge completed. Hard erasure
      // re-pins every such tag at the post-delete live snapshot (a
      // forward re-tag is atomic — drop+retag would lose the name's
      // pinning on a crash between the two), after which no tagged or
      // retained snapshot precedes the erasure commit and the vacuum can
      // physically sweep the pre-delete files.
      table.currentVersion.foreach { live =>
        table.tags.filter { case (_, v) => v < live }
          .keys.toSeq.sorted.foreach(n => table.tag(n, live))
      }
      table.branches.foreach(b => table.forBranch(b).vacuum(keepLast = 1))
      table.vacuum(keepLast = 1)
    }
    SweepReport(raw, compacted, ZoneReport(if (erased > 0) 1L else 0L, erased))
  }
}
