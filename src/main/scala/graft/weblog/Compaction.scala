package graft.weblog

import java.time.LocalDateTime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hourly JSON→Parquet compaction (reference operators C1/C2/C3 —
  * `web-analytics-parquet/src/main/python/MergeSmallFiles/athena_ctas.py`).
  *
  * The reference runs `CREATE TABLE tmp_… AS SELECT {cols} FROM
  * web_log_json WHERE year=… AND month=… AND day=… AND hour=…`
  * (`athena_ctas.py:30-39`) fire-and-forget with 10s sleeps between
  * statements. Our job is synchronous and collapses the tmp-table dance
  * (C3) into write-to-staging + rename swap (SURVEY §3.2): the hour is
  * fully written in staging before it becomes visible, and a re-run of
  * the same hour is idempotent (the old dir is renamed aside to a trash
  * dir, staging renamed in, trash deleted — so the dest-missing window is
  * two metadata renames, not a data rewrite). Caveat: rename is atomic
  * only on HDFS/local filesystems; on object stores (S3) rename is
  * copy+delete, so a concurrent reader can observe a partial or missing
  * hour during the swap — there, readers should go through the catalog
  * (C2 registers the partition only after the swap completes).
  *
  * Scale: the scan is partition-pruned *by construction* (we read only the
  * hour's directory); `targetFiles` implements the small-file merge that
  * is the whole point of the job (`README.md:258-263`). At 100 TB the unit
  * of work stays one ingest hour, so cost scales with ingest rate, not
  * table size.
  */
object Compaction {

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
    // Swap: old dir aside -> staging in -> drop old. Idempotent re-run of
    // the hour; see the object-store caveat in the class scaladoc.
    val trashDir = new Path(s"$parquetPath/.trash_${hp.year}_${hp.month}_${hp.day}_${hp.hour}")
    fs.delete(trashDir, true)
    fs.mkdirs(destDir.getParent)
    val hadOld = fs.exists(destDir) && fs.rename(destDir, trashDir)
    if (!fs.rename(stagingDir, destDir))
      throw new java.io.IOException(s"swap failed: $stagingDir -> $destDir")
    if (hadOld) fs.delete(trashDir, true)
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
