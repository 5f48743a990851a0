package graft.weblog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Emulation: partitioned parquet. The user-visible partition column is
  * `event` (like the reference's `PARTITIONED BY (event)`, `README.md:181`),
  * but `event` alone has ~6 values, so a merge that dynamic-overwrites
  * whole event partitions would rewrite table_size/6 per micro-batch — at
  * 100 TB, effectively the whole table. Real Iceberg MERGE rewrites only
  * the data files containing matched keys; we emulate that rewrite unit by
  * sub-bucketing keyed tables one level deeper:
  * `event=X/gbucket=pmod(xxhash64(unique_keys), numBuckets)`. A merge then
  * touches only the `(event, gbucket)` leaves that contain batch keys, so
  * the rewrite bound is `batch_distinct_(event,bucket)_pairs ×
  * (table_size / (|event| × numBuckets))` — tunable via `numBuckets`,
  * independent of total table size for a key-local batch. `gbucket` is an
  * internal layout column: `read` hides it, and it is deterministically
  * recomputable from the keys, so it never leaks into user schemas.
  *
  * The merge itself proceeds in three steps: (1) last-write-wins dedup of
  * the incoming batch on the unique keys, (2) order-aware merge of the
  * *affected leaves only* — per key, the max-`orderCol` row across stored
  * ∪ incoming wins, so a replayed/out-of-order batch can never clobber
  * newer data, (3) dynamic-partition-overwrite of exactly those leaves.
  */
final case class IcebergLikeTable(
    spark: SparkSession,
    path: String,
    partitionCol: String = "event",
    uniqueKeys: Seq[String] = Nil,
    numBuckets: Int = 16) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Internal sub-bucket column (keyed tables only). Must not start with
    * `_`/`.` — Spark's file index treats such directories as hidden.
    */
  val bucketCol = "gbucket"

  private def partCols: Seq[String] =
    if (uniqueKeys.isEmpty) Seq(partitionCol) else Seq(partitionCol, bucketCol)

  private def withBucket(df: DataFrame): DataFrame =
    if (uniqueKeys.isEmpty) df
    else df.withColumn(bucketCol,
      pmod(xxhash64(uniqueKeys.map(col): _*), lit(numBuckets.toLong)).cast("int"))

  def exists: Boolean = fs.exists(new Path(path))

  /** User-facing read: the internal bucket column is layout, not schema. */
  def read: DataFrame =
    if (uniqueKeys.isEmpty) spark.read.parquet(path)
    else spark.read.parquet(path).drop(bucketCol)

  /** Raw read including the layout columns (merge/maintenance internals). */
  private def readRaw: DataFrame = spark.read.parquet(path)

  /** T3: the routing decision the transformer stamps on every record. */
  def operation: String = if (uniqueKeys.isEmpty) "insert" else "update"

  /** S10 append path (`operation='insert'`). */
  def append(df: DataFrame): Unit =
    withBucket(df).write.mode("append")
      .partitionBy(partCols: _*)
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
    val deduped = withBucket(batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn"))

    if (!exists) {
      deduped.write.mode("append")
        .partitionBy(partCols: _*)
        .option("compression", "snappy")
        .parquet(path)
      return
    }

    val cols = readRaw.columns
    // affected (event, bucket) leaves only — bounded by the batch's
    // distinct key-derived pairs (≤ |event| × numBuckets), never by table
    // size; this collect is O(pairs), not O(data).
    val pairs = deduped.select(partitionCol, bucketCol).distinct()
      .collect().map(r => (r.get(0), r.getInt(1))).toSeq
    val leafPred: Column = pairs.map { case (e, b) =>
      col(partitionCol) === lit(e) && col(bucketCol) === lit(b)
    }.reduce(_ || _)
    // both predicate columns are partition columns → partition pruning
    // makes this read list only the affected leaf directories.
    val old = readRaw.filter(leafPred)
    // keep the max-orderCol row per key across (stored ∪ incoming); the
    // shuffle is on the unique keys of the hot leaves only, same as
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
    // merged leaves, then dynamic-overwrite only those leaves.
    val staging = s"$path/../.staging_merge_${System.nanoTime()}"
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
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
    * Athena's OPTIMIZE. Here: leaf partitions whose data-file count
    * exceeds `fileThreshold` are rewritten via dynamic partition
    * overwrite. Returns the rewritten leaf partition paths. Cost is
    * proportional to the hot leaves, never the table.
    */
  def maintain(fileThreshold: Int = 10, targetFiles: Int = 1): Seq[String] = {
    if (!exists) return Nil
    val prefix = s"$partitionCol="
    val hot = Zones.partitionStats(spark, path)
      .filter(col("partition").startsWith(prefix) && col("n_files") > fileThreshold)
      .select("partition").collect().map(_.getString(0)).toSeq
    if (hot.isEmpty) return Nil
    // a leaf path is `event=X` or `event=X/gbucket=N` — rebuild the
    // partition-pruning predicate from its segments.
    val hotPred = hot.map { leaf =>
      leaf.split("/").toSeq.map { seg =>
        val Array(k, v) = seg.split("=", 2)
        col(k) === lit(v)
      }.reduce(_ && _)
    }.reduce(_ || _)
    val staging = s"$path/../.staging_maintain_${System.nanoTime()}"
    readRaw.filter(hotPred)
      .repartition(targetFiles * hot.size, partCols.map(col): _*)
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .coalesce(math.max(targetFiles * hot.size, 1))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .option("compression", "snappy")
      .parquet(path)
    fs.delete(new Path(staging), true)
    hot.map(_.stripPrefix(prefix))
  }
}
