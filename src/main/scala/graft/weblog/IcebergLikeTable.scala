package graft.weblog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iceberg-style append/upsert table without an Iceberg runtime
  * (reference operators S10/T3, SURVEY.md §2.1). The reference's Firehose
  * Iceberg destination routes each batch on per-record `otfMetadata`:
  * `operation='insert'` appends; declared `unique_keys` (e.g.
  * `["user_id","timestamp"]`, `web-analytics-iceberg/.example.cdk.context.json:22-24`)
  * switches to key-based update — i.e.
  * `MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE * WHEN NOT
  * MATCHED THEN INSERT *` (`firehose_to_iceberg.py:111-117`;
  * operation choice `firehose_to_iceberg_transformer.py:114-115`).
  *
  * Emulation: partitioned parquet (partition column `event`, like the
  * reference's `PARTITIONED BY (event)`, `README.md:181`) + a merge in
  * three steps: (1) last-write-wins dedup of the incoming batch on the
  * unique keys, (2) order-aware merge of the *affected partitions only*
  * — per key, the max-`orderCol` row across stored ∪ incoming wins, so a
  * replayed/out-of-order batch can never clobber newer data, (3)
  * dynamic-partition-overwrite of exactly those partitions. Untouched
  * partitions are never rewritten — at 100 TB the merge cost is
  * proportional to the hot partitions, not the table.
  */
final case class IcebergLikeTable(
    spark: SparkSession,
    path: String,
    partitionCol: String = "event",
    uniqueKeys: Seq[String] = Nil) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  def read: DataFrame = spark.read.parquet(path)

  /** T3: the routing decision the transformer stamps on every record. */
  def operation: String = if (uniqueKeys.isEmpty) "insert" else "update"

  /** S10 append path (`operation='insert'`). */
  def append(df: DataFrame): Unit =
    df.write.mode("append")
      .partitionBy(partitionCol)
      .option("compression", "snappy")
      .parquet(path)

  /** S10 upsert path (`operation='update'`). `orderCol` decides
    * last-write-wins — both for duplicate keys inside the batch AND
    * against rows already in the table (arrival order in the reference's
    * stream; callers pass a sequence/arrival column — may be a struct,
    * e.g. `(batch, mid)`, which orders lexicographically batch-major).
    * Because the stored `orderCol` participates in the merge, replaying
    * an OLDER micro-batch after a newer one has committed cannot
    * overwrite the newer rows — the exact failure mode of an
    * incoming-always-wins merge under out-of-order replay.
    */
  def upsert(batch: DataFrame, orderCol: String): Unit = {
    require(uniqueKeys.nonEmpty, "upsert requires declared unique_keys")
    val keyCols = uniqueKeys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(orderCol).desc)
    val deduped = batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")

    if (!exists) { append(deduped); return }

    val cols = read.columns
    // affected partitions only — the partition column is low-cardinality
    // by design (6 event types), so this collect is O(6), not O(data).
    val parts = deduped.select(partitionCol).distinct()
      .collect().map(_.get(0)).toSeq
    val old = read.filter(col(partitionCol).isin(parts: _*))
    // keep the max-orderCol row per key across (stored ∪ incoming); the
    // shuffle is on the unique keys of the hot partitions only, same as
    // the anti-join it replaces, but order-aware. Ties on orderCol break
    // toward the INCOMING row (MERGE semantics: an exact re-send with the
    // same sequence but corrected content must still win).
    val mergeW = Window.partitionBy(keyCols: _*)
      .orderBy(col(orderCol).desc, col("_is_new").desc)
    val merged = old.withColumn("_is_new", lit(0))
      .unionByName(deduped.selectExpr(cols: _*).withColumn("_is_new", lit(1)))
      .withColumn("_rn", row_number().over(mergeW))
      .filter(col("_rn") === 1)
      .drop("_rn", "_is_new")

    // Parquet can't overwrite a path that feeds the same plan — stage the
    // merged partitions, then dynamic-overwrite only those partitions.
    val staging = s"$path/../.staging_merge_${System.nanoTime()}"
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .option("compression", "snappy")
      .parquet(path)
    fs.delete(new Path(staging), true)
  }

  /** Route a batch per the deployment's T3 metadata: upsert iff keys. */
  def write(batch: DataFrame, orderCol: String): Unit =
    if (uniqueKeys.isEmpty) append(batch) else upsert(batch, orderCol)

  /** C7: small-file maintenance — the reference declares
    * `optimize_rewrite_delete_file_threshold='10'`
    * (`web-analytics-iceberg/README.md:187`) and delegates the rewrite to
    * Athena's OPTIMIZE. Here: partitions whose data-file count exceeds
    * `fileThreshold` are rewritten to `targetFiles` files via dynamic
    * partition overwrite. Returns the rewritten partition values. Cost is
    * proportional to the hot partitions, never the table.
    */
  def maintain(fileThreshold: Int = 10, targetFiles: Int = 1): Seq[String] = {
    if (!exists) return Nil
    val prefix = s"$partitionCol="
    val hot = Zones.partitionStats(spark, path)
      .filter(col("partition").startsWith(prefix) && col("n_files") > fileThreshold)
      .select("partition").collect()
      .map(_.getString(0).stripPrefix(prefix)).toSeq
    if (hot.isEmpty) return Nil
    val staging = s"$path/../.staging_maintain_${System.nanoTime()}"
    read.filter(col(partitionCol).isin(hot: _*))
      .repartition(targetFiles * hot.size, col(partitionCol))
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .coalesce(math.max(targetFiles * hot.size, 1))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .option("compression", "snappy")
      .parquet(path)
    fs.delete(new Path(staging), true)
    hot
  }
}
