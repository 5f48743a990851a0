package graft.weblog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-zone writers (reference operators S7/S8/S9, SURVEY.md §2.1).
  *
  * Layout mirrors the reference's hive-style ingest-hour partitioning:
  * `json-data/year=Y/month=M/day=D/hour=H/` — partition values are ints in
  * the catalog (`athena_named_query.py:33-37`); the reference's zero-padded
  * S3 *paths* (`athena_ctas.py:28`) are a Firehose artifact we do not
  * reproduce (Spark's partition discovery reads either form).
  *
  * Partitions derive from *ingest wall-clock time*, not the record's
  * event `timestamp` (SURVEY §1.3 / §7.4 risk 5) — callers pass the ingest
  * timestamp column explicitly to keep the two clocks distinct.
  */
object Zones {

  /** year/month/day/hour partition columns from an ingest-time column. */
  def partitionCols(ingestTs: Column): Seq[Column] = Seq(
    year(ingestTs).as("year"), month(ingestTs).as("month"),
    dayofmonth(ingestTs).as("day"), hour(ingestTs).as("hour"))

  /** S7: raw zone — JSON Lines (payload verbatim, newline-delimited via the
    * text sink = the reference's T2 normalization), UNCOMPRESSED
    * (`.example.cdk.context.json:15-16`), partitioned by ingest hour.
    */
  def writeRawJson(df: DataFrame, path: String, payloadCol: String = "payload",
      ingestTsCol: String = "ingest_ts"): Unit =
    df.select(col(payloadCol).as("value") +: partitionCols(col(ingestTsCol)): _*)
      .write.mode("append")
      .partitionBy(WebLogSchema.PartitionCols: _*)
      .option("compression", "none")
      .text(path)

  /** S8: error zone — failed records with their failure reason as an extra
    * routing dimension (the reference encodes it in the S3 prefix via
    * `!{firehose:error-output-type}`, `firehose.py:175`).
    */
  def writeErrors(df: DataFrame, path: String, payloadCol: String = "payload",
      ingestTsCol: String = "ingest_ts", reasonCol: String = "reason"): Unit =
    df.select(Seq(col(payloadCol).as("value"), col(reasonCol).as("error_type"))
        ++ partitionCols(col(ingestTsCol)): _*)
      .write.mode("append")
      .partitionBy("error_type" +: WebLogSchema.PartitionCols: _*)
      .option("compression", "none")
      .json(path)

  /** S9: analytics zone — Parquet + Snappy (`athena_ctas.py:33-34`),
    * `targetFiles` controls the small-file merge (C1's whole purpose,
    * `README.md:258-263`); `maxRecordsPerFile` bounds the other extreme.
    */
  def writeParquet(df: DataFrame, path: String, targetFiles: Int = 1,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(targetFiles)
      .write.mode("append")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Small-file monitoring for a zone: one row per leaf partition
    * directory with file count and byte totals — the signal that decides
    * when C1 compaction is due (`README.md:258-263` is the reference's
    * prose motivation). Listing runs on the driver against the
    * filesystem's `listFiles(recursive)` — a metadata scan, no data read.
    */
  def partitionStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootStr = root.toUri.getPath
    val it = fs.listFiles(root, true)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val rel = f.getPath.getParent.toUri.getPath.stripPrefix(rootStr).stripPrefix("/")
        rows += ((if (rel.isEmpty) "<root>" else rel, f.getLen))
      }
    }
    rows.toSeq.toDF("partition", "bytes")
      .groupBy("partition")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("total_bytes"),
        max("bytes").as("max_file_bytes"), min("bytes").as("min_file_bytes"))
      .orderBy("partition")
  }
}
