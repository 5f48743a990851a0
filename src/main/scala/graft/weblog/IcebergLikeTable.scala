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
  * Emulation: partitioned parquet + the versioned-manifest commit
  * protocol ([[Manifests]]). The user-visible partition column is
  * `event` (like the reference's `PARTITIONED BY (event)`, `README.md:181`),
  * but `event` alone has ~6 values, so a merge that rewrote whole event
  * partitions would rewrite table_size/6 per micro-batch — at 100 TB,
  * effectively the whole table. Real Iceberg MERGE rewrites only the
  * data files containing matched keys; we emulate that rewrite unit by
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
  * newer data, (3) a SNAPSHOT COMMIT: the merged leaves' files land under
  * version-unique names (dormant), then one table-root manifest publishes
  * the new snapshot = (previous files outside the affected leaves) +
  * (the rewritten leaves' new files). Iceberg-like reader semantics
  * follow for free:
  *  - **Snapshot isolation**: a reader that resolved version N reads a
  *    complete, immutable file set — an in-flight upsert (staging,
  *    import, even the manifest publish itself) cannot show it a
  *    half-rewritten leaf (IcebergCommitSpec interleaves reads between
  *    every commit step to prove it).
  *  - **Time travel**: manifests are create-only, so `readAt(version)`
  *    reads any retained historical snapshot.
  *  - **Add-column schema evolution**: a batch carrying a new column
  *    merges cleanly (stored rows read null for it; see the merge's
  *    `allowMissingColumns` note), like Iceberg's ADD COLUMN.
  *  - **Retention GC**: each commit expires snapshots beyond
  *    `retainVersions` and deletes files referenced by no retained
  *    manifest (Iceberg's `expire_snapshots`); `vacuum()` runs the same
  *    policy on demand. A reader more than `retainVersions` commits
  *    stale can race GC — the standard retention trade; size
  *    `retainVersions` to the read horizon.
  * Writers are single-writer-at-a-time (the reference's Firehose is a
  * single delivery stream per table); readers need no coordination.
  */
final case class IcebergLikeTable(
    spark: SparkSession,
    path: String,
    partitionCol: String = "event",
    uniqueKeys: Seq[String] = Nil,
    numBuckets: Int = 16,
    retainVersions: Int = 8) {

  require(retainVersions >= 1, "retainVersions must keep at least the live snapshot")

  private def root = new Path(path)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

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

  def exists: Boolean = fs.exists(root)

  /** Committed snapshot versions, ascending (within retention). */
  def versions: Seq[Long] = Manifests.versions(fs, root)

  /** The live snapshot version, if the table has committed at all. */
  def currentVersion: Option[Long] = versions.lastOption

  /** The live snapshot's data files, relative to the table root. Falls
    * back to a recursive directory walk only for pre-manifest tables
    * (data written before any manifest existed), so a first upsert on
    * such a table still carries every existing file into its snapshot.
    */
  private def liveFiles: Seq[String] =
    Manifests.resolve(fs, root).map(_._2).getOrElse(walkDataFiles())

  private def walkDataFiles(): Seq[String] = {
    if (!exists) return Nil
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (s.isDirectory) walk(s.getPath)
        else Seq(s.getPath)
      }
    val rootUri = root.toUri.getPath
    walk(root).map(_.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")).sorted
  }

  /** Read an explicit snapshot file set; `basePath` recovers the
    * partition columns from the relative leaf paths, and the resulting
    * file index still partition-prunes on `event`/`gbucket` filters.
    * `mergeSchema` unions per-file schemas so files written before a
    * column was added read as null for it (add-column schema evolution;
    * real Iceberg resolves this from table metadata instead of footers —
    * stamping the schema into the manifest is the equivalent follow-up
    * if footer reads ever show up at scale).
    */
  private def readFileSet(files: Seq[String]): DataFrame = {
    require(files.nonEmpty, s"empty snapshot under $path")
    spark.read.option("basePath", path).option("mergeSchema", "true")
      .parquet(files.map(f => s"$path/$f"): _*)
  }

  /** User-facing read of the live snapshot: the internal bucket column
    * is layout, not schema.
    */
  def read: DataFrame =
    if (uniqueKeys.isEmpty) readRaw else readRaw.drop(bucketCol)

  /** Time travel: read a retained historical snapshot by version. */
  def readAt(version: Long): DataFrame = {
    val files = Manifests.at(fs, root, version).getOrElse(
      throw new NoSuchElementException(
        s"snapshot v$version not found (expired or never committed) under $path"))
    val df = readFileSet(files)
    if (uniqueKeys.isEmpty) df else df.drop(bucketCol)
  }

  /** Raw live read including the layout columns (merge/maintenance
    * internals).
    */
  private def readRaw: DataFrame = readFileSet(liveFiles)

  /** T3: the routing decision the transformer stamps on every record. */
  def operation: String = if (uniqueKeys.isEmpty) "insert" else "update"

  /** Stage `df` partitioned by the layout columns, import the staged tree
    * under version-unique names, and commit `carryOver ++ imported` as a
    * new snapshot. The single manifest create is the commit point.
    */
  private def commitStaged(df: DataFrame, carryOver: Seq[String]): Seq[String] = {
    val version = nextVersion()
    val staging = new Path(root.getParent, s".staging_v$version")
    df.write.mode("overwrite")
      .partitionBy(partCols: _*)
      .option("compression", "snappy")
      .parquet(staging.toString)
    val imported = Manifests.importStagedTree(fs, staging, root, version)
    Manifests.write(fs, root, version, carryOver ++ imported)
    fs.delete(staging, true)
    expireSnapshots()
    imported
  }

  /** Strictly increasing commit version (nanoTime ties broken upward —
    * the single-writer invariant makes this safe).
    */
  private def nextVersion(): Long =
    math.max(System.nanoTime(), currentVersion.getOrElse(0L) + 1L)

  /** Retention GC (Iceberg `expire_snapshots`): drop manifests beyond
    * `retainVersions` and every data file referenced by no retained
    * manifest. Runs after each commit point, never before it.
    */
  def vacuum(keepLast: Int = retainVersions): Unit = {
    val all = versions
    if (all.size <= keepLast) return
    val (expired, retained) = all.splitAt(all.size - keepLast)
    val referenced = retained.flatMap(v => Manifests.at(fs, root, v).getOrElse(Nil)).toSet
    expired.foreach { v =>
      Manifests.at(fs, root, v).getOrElse(Nil)
        .filterNot(referenced)
        .foreach(f => fs.delete(new Path(root, f), false))
      fs.delete(new Path(root, s"${Manifests.Prefix}$v"), false)
    }
  }

  private def expireSnapshots(): Unit = vacuum(retainVersions)

  /** S10 append path (`operation='insert'`). Appends never invalidate
    * prior files, so every retained snapshot stays fully readable.
    */
  def append(df: DataFrame): Unit =
    commitStaged(withBucket(df), carryOver = liveFiles)

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

    val previous = liveFiles
    if (previous.isEmpty) {
      commitStaged(deduped, carryOver = Nil)
      return
    }

    // affected (event, bucket) leaves only — bounded by the batch's
    // distinct key-derived pairs (≤ |event| × numBuckets), never by table
    // size; this collect is O(pairs), not O(data).
    val pairs = deduped.select(partitionCol, bucketCol).distinct()
      .collect().map(r => (r.get(0), r.getInt(1))).toSeq
    val leafPred: Column = pairs.map { case (e, b) =>
      col(partitionCol) === lit(e) && col(bucketCol) === lit(b)
    }.reduce(_ || _)
    // both predicate columns are partition columns → partition pruning
    // makes this read touch only the affected leaves' files.
    val old = readRaw.filter(leafPred)
    // keep the max-orderCol row per key across (stored ∪ incoming); the
    // shuffle is on the unique keys of the hot leaves only, same as
    // the anti-join it replaces, but order-aware. Ties on orderCol break
    // toward the INCOMING row (MERGE semantics: an exact re-send with the
    // same sequence but corrected content must still win).
    // allowMissingColumns = add-column schema evolution: a batch with a
    // NEW column null-fills stored rows; a batch missing a column
    // null-fills its own rows (and a winning batch row then overwrites
    // the stored value with null — standard MERGE UPDATE * semantics).
    val mergeW = Window.partitionBy(keyCols: _*)
      .orderBy(col(orderCol).desc, col("_is_new").desc)
    val merged = old.withColumn("_is_new", lit(0))
      .unionByName(deduped.withColumn("_is_new", lit(1)),
        allowMissingColumns = true)
      .withColumn("_rn", row_number().over(mergeW))
      .filter(col("_rn") === 1)
      .drop("_rn", "_is_new")

    // Snapshot commit: stage the rewritten leaves, import, publish a
    // manifest carrying over every live file OUTSIDE the affected leaves.
    // Readers on the previous version keep their complete file set until
    // retention expires it.
    val imported = commitStagedMerge(merged, previous, pairs)
    require(imported.nonEmpty, "merge of a non-empty batch produced no files")
  }

  private def commitStagedMerge(merged: DataFrame, previous: Seq[String],
      pairs: Seq[(Any, Int)]): Seq[String] = {
    // a leaf's relative dir is exactly how partitionBy lays it out; the
    // staged import reproduces the same relative dirs, so carry-over is
    // "previous files whose leaf is not rewritten". Leaf names derive
    // from the imported tree (never string-formatted from values, so
    // partition-value escaping can't diverge).
    val version = nextVersion()
    val staging = new Path(root.getParent, s".staging_v$version")
    merged.write.mode("overwrite")
      .partitionBy(partCols: _*)
      .option("compression", "snappy")
      .parquet(staging.toString)
    val imported = Manifests.importStagedTree(fs, staging, root, version)
    val rewrittenLeaves = imported.map(leafOf).toSet
    val carryOver = previous.filterNot(f => rewrittenLeaves.contains(leafOf(f)))
    Manifests.write(fs, root, version, carryOver ++ imported)
    fs.delete(staging, true)
    expireSnapshots()
    imported
  }

  private def leafOf(relFile: String): String = {
    val i = relFile.lastIndexOf('/')
    if (i < 0) "" else relFile.substring(0, i)
  }

  /** Route a batch per the deployment's T3 metadata: upsert iff keys. */
  def write(batch: DataFrame, orderCol: String): Unit =
    if (uniqueKeys.isEmpty) append(batch) else upsert(batch, orderCol)

  /** C7: small-file maintenance — the reference declares
    * `optimize_rewrite_delete_file_threshold='10'`
    * (`web-analytics-iceberg/README.md:187`) and delegates the rewrite to
    * Athena's OPTIMIZE. Here: leaf partitions whose live-snapshot file
    * count exceeds `fileThreshold` are rewritten and committed as a new
    * snapshot (same manifest protocol — concurrent readers are
    * undisturbed). Returns the rewritten leaf partition paths. Cost is
    * proportional to the hot leaves, never the table.
    */
  def maintain(fileThreshold: Int = 10, targetFiles: Int = 1): Seq[String] = {
    if (!exists) return Nil
    val previous = liveFiles
    if (previous.isEmpty) return Nil
    val hot = previous.groupBy(leafOf).filter(_._2.size > fileThreshold).keys.toSeq.sorted
    if (hot.isEmpty) return Nil
    val hotSet = hot.toSet
    val hotFiles = previous.filter(f => hotSet.contains(leafOf(f)))
    val version = nextVersion()
    val staging = new Path(root.getParent, s".staging_v$version")
    readFileSet(hotFiles)
      .repartition(targetFiles * hot.size, partCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .option("compression", "snappy")
      .parquet(staging.toString)
    val imported = Manifests.importStagedTree(fs, staging, root, version)
    val carryOver = previous.filterNot(f => hotSet.contains(leafOf(f)))
    Manifests.write(fs, root, version, carryOver ++ imported)
    fs.delete(staging, true)
    expireSnapshots()
    hot.map(_.stripPrefix(s"$partitionCol="))
  }
}
