package graft.weblog

import java.time.LocalDateTime

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hourly JSON→Parquet compaction (reference operators C1/C2/C3 —
  * `web-analytics-parquet/src/main/python/MergeSmallFiles/athena_ctas.py`).
  *
  * The reference runs `CREATE TABLE tmp_… AS SELECT {cols} FROM
  * web_log_json WHERE year=… AND month=… AND day=… AND hour=…`
  * (`athena_ctas.py:30-39`) fire-and-forget with 10s sleeps between
  * statements. Our job is synchronous and collapses the tmp-table dance
  * (C3) into an OBJECT-STORE-SAFE manifest commit (SURVEY §3.2): the
  * hour is fully written in staging, its files move into the hour
  * directory under version-unique names (each file becomes visible
  * atomically — a PUT on S3, a rename on HDFS; existing names are never
  * overwritten), then ONE versioned manifest file
  * (`_graft_manifest_v<n>`, underscore-hidden from Spark's data
  * listing) is created listing exactly the new file set — the commit
  * point — and only then are the previous version's files deleted.
  * A reader that resolves the newest manifest ([[readCompactedHour]])
  * therefore sees the complete OLD hour before the commit point and the
  * complete NEW hour after it — never a missing or partial hour, even
  * on stores with non-atomic rename (CompactionCommitSpec interleaves
  * reads between every commit step to prove it). Re-running an hour is
  * idempotent: a new version supersedes and garbage-collects the old.
  * Raw directory listers get the same correctness on rename-atomic
  * filesystems and should go through the manifest/catalog on S3 (C2
  * registers the partition after the commit point).
  *
  * Scale: the scan is partition-pruned *by construction* (we read only the
  * hour's directory); `targetFiles` implements the small-file merge that
  * is the whole point of the job (`README.md:258-263`). At 100 TB the unit
  * of work stays one ingest hour, so cost scales with ingest rate, not
  * table size.
  */
object Compaction {

  /** Move staged part-files into the hour dir under version-unique names
    * — see [[Manifests.importStaged]] (shared with the upsert table).
    */
  private[weblog] def importStaged(fs: FileSystem, stagingDir: Path,
      destDir: Path, version: Long): Seq[String] =
    Manifests.importStaged(fs, stagingDir, destDir, version)

  /** THE commit point — see [[Manifests.write]]. */
  private[weblog] def writeManifest(fs: FileSystem, destDir: Path,
      version: Long, files: Seq[String]): Unit =
    Manifests.write(fs, destDir, version, files)

  /** Newest (version, files) for an hour dir, if any manifest exists. */
  private[weblog] def currentManifest(fs: FileSystem,
      destDir: Path): Option[(Long, Seq[String])] =
    Manifests.resolve(fs, destDir)

  /** Drop every data file and manifest not belonging to the newest
    * version — run AFTER the commit point, so a concurrent
    * manifest-resolving reader never loses its current version's files
    * to anything but this (post-commit) GC. A reader that resolved the
    * OLD manifest just before the commit can still race this deletion
    * mid-scan — the standard snapshot-GC trade; production deployments
    * delay GC by a retention period (run `cleanupStale` from a later
    * job) exactly as Iceberg/Delta retention does.
    */
  private[weblog] def cleanupStale(fs: FileSystem, destDir: Path): Unit =
    currentManifest(fs, destDir).foreach { case (v, files) =>
      val keep = files.toSet + s"${Manifests.Prefix}$v"
      fs.listStatus(destDir)
        .filter(s => s.isFile && !keep.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }

  /** Manifest-resolving read of one compacted hour — the reader side of
    * the commit protocol (complete-old or complete-new, never partial).
    * Falls back to a plain directory read where no manifest exists.
    */
  def readCompactedHour(spark: SparkSession, parquetPath: String,
      hp: HourPartition): DataFrame = {
    val destDir = new Path(s"$parquetPath/${hp.relPath}")
    val fs = destDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentManifest(fs, destDir) match {
      case Some((_, files)) =>
        spark.read.parquet(files.map(f => new Path(destDir, f).toString): _*)
      case None => spark.read.parquet(destDir.toString)
    }
  }

  final case class HourPartition(year: Int, month: Int, day: Int, hour: Int) {
    def relPath: String = s"year=$year/month=$month/day=$day/hour=$hour"
    def spec: String = s"year=$year, month=$month, day=$day, hour=$hour"
  }

  object HourPartition {
    def of(dt: LocalDateTime): HourPartition =
      HourPartition(dt.getYear, dt.getMonthValue, dt.getDayOfMonth, dt.getHour)
    /** The reference compacts hour H−1 relative to the trigger
      * (`athena_ctas.py:141-143`).
      */
    def target(triggerTime: LocalDateTime): HourPartition = of(triggerTime.minusHours(1))
  }

  /** Parse one raw-zone hour of JSON-lines payloads into typed columns.
    * Reads exactly the hour directory — partition pruning by construction,
    * like the reference's CTAS WHERE clause (`athena_ctas.py:36-37`).
    */
  def readRawHour(spark: SparkSession, rawPath: String, hp: HourPartition,
      dialect: String = "B"): DataFrame = {
    val st = WebLogSchema.structType(dialect)
    spark.read.schema(st).json(s"$rawPath/${hp.relPath}")
      .withColumn("event_ts", to_timestamp(col("timestamp"), WebLogSchema.TsPattern))
  }

  /** C1: compact one hour of raw JSON into few large snappy-parquet files
    * at `parquetPath/year=…/month=…/day=…/hour=…`, atomically. Returns the
    * row count written. `columns` defaults to the full data-column list
    * (the reference's COLUMN_NAMES default '*', `athena_ctas.py:26`).
    */
  def compactHour(spark: SparkSession, rawPath: String, parquetPath: String,
      hp: HourPartition, dialect: String = "B", targetFiles: Int = 1,
      columns: Seq[String] = Nil): Long = {
    val src = readRawHour(spark, rawPath, hp, dialect)
    val projected = if (columns.isEmpty) src else src.select(columns.map(col): _*)

    val destDir = new Path(s"$parquetPath/${hp.relPath}")
    val stagingDir = new Path(s"$parquetPath/.staging_${hp.year}_${hp.month}_${hp.day}_${hp.hour}")
    val fs = destDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stagingDir, true)

    projected.repartition(targetFiles)
      .write.mode("overwrite")
      .option("compression", "snappy")
      .parquet(stagingDir.toString)

    val n = spark.read.parquet(stagingDir.toString).count()
    // Manifest commit: files in (dormant) -> manifest (commit point) ->
    // GC the superseded version. See the class scaladoc for why each
    // step is safe under non-atomic-rename stores. The version must
    // EXCEED the live one or readers keep resolving the old manifest —
    // nanoTime alone can regress across JVM restarts (its origin is
    // arbitrary), so a re-compaction from a fresh job ties upward.
    val version = math.max(System.nanoTime(),
      currentManifest(fs, destDir).map(_._1 + 1L).getOrElse(0L))
    val files = importStaged(fs, stagingDir, destDir, version)
    writeManifest(fs, destDir, version, files)
    cleanupStale(fs, destDir)
    fs.delete(stagingDir, true)
    n
  }

  /** C1+C2 against cataloged tables: compact hour H−1 and register the
    * ±1h partition window on both tables (`athena_ctas.py:55-59` loops
    * (1,0,-1); H+1 pre-registration tolerates hour-boundary stragglers).
    */
  def run(spark: SparkSession, rawPath: String, parquetPath: String,
      triggerTime: LocalDateTime, dialect: String = "B", targetFiles: Int = 1,
      jsonTable: Option[String] = None, parquetTable: Option[String] = None): Long = {
    val hp = HourPartition.target(triggerTime)
    val n = compactHour(spark, rawPath, parquetPath, hp, dialect, targetFiles)
    for (t <- jsonTable; off <- Seq(1, 0, -1)) {
      val p = HourPartition.of(triggerTime.minusHours(1).plusHours(off))
      WebLogCatalog.addPartition(spark, t, p, s"$rawPath/${p.relPath}")
    }
    for (t <- parquetTable; off <- Seq(1, 0, -1)) {
      val p = HourPartition.of(triggerTime.minusHours(1).plusHours(off))
      WebLogCatalog.addPartition(spark, t, p, s"$parquetPath/${p.relPath}")
    }
    n
  }
}
