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

  /** The live (version, files) pair, resolved in ONE metadata round trip
    * per operation — (0, Nil) for a table that has never committed. Data
    * files on disk but in no manifest are dormant by protocol (debris of
    * a crashed commit at worst) and are never read; [[vacuum]] sweeps
    * them.
    */
  private def resolveLive(): (Long, Seq[String]) =
    Manifests.resolve(fs, root).getOrElse((0L, Nil))

  /** The live snapshot's data files, relative to the table root. */
  private def liveFiles: Seq[String] = resolveLive()._2

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

  /** Incremental/CDC read (Iceberg's changelog scan, Delta's CDF): the
    * row-level changes between two retained snapshots, emitted as
    * `_change_type ∈ {insert, delete, update_preimage, update_postimage}`
    * plus the row, stamped `_commit_version = toVersion`.
    *
    * The manifest protocol makes this cheap: a file carried over between
    * the two manifests holds byte-identical rows, so ONLY leaves whose
    * file set differs can contain changes — the diff reads those leaves'
    * files from each snapshot and full-outer-joins them on the unique
    * keys. Cost is O(changed leaves), never O(table): a key-local commit
    * against a 100 TB table diffs a handful of `(event, gbucket)` leaves.
    * Rows a rewrite carried through unchanged (the rest of a merged
    * leaf) compare value-equal and are suppressed, so a `maintain()`
    * compaction between the versions contributes zero change rows.
    *
    * Keyed tables only — key-less tables are append-only (appends never
    * invalidate files), so their incremental read is just the new files;
    * [[appendsBetween]] serves that path. Caveat (same scoping as the
    * merge itself): key uniqueness is enforced per `(event, gbucket)`
    * leaf, so a key that was re-sent under a DIFFERENT event value has
    * one live row per event; if both such leaves change in the window,
    * the key joins many-to-many and its change rows should be read
    * per-event (include `event` in the consumer's key).
    */
  def changesBetween(fromVersion: Long, toVersion: Long): DataFrame = {
    require(uniqueKeys.nonEmpty,
      "changesBetween requires declared unique_keys; use appendsBetween for append-only tables")
    val (oldFiles, newFiles) = changedLeafFiles(fromVersion, toVersion)
    val oldDf = if (oldFiles.isEmpty) None else Some(readFileSet(oldFiles).drop(bucketCol))
    val newDf = if (newFiles.isEmpty) None else Some(readFileSet(newFiles).drop(bucketCol))

    def tagged(df: DataFrame, tag: String): DataFrame =
      df.select(lit(tag).as("_change_type") +: df.columns.map(col): _*)
        .withColumn("_commit_version", lit(toVersion))

    (oldDf, newDf) match {
      case (None, None) =>
        // no leaf changed at all — an empty, correctly-typed changelog
        tagged(read.limit(0), "insert")
      case (None, Some(n)) => tagged(n, "insert")
      case (Some(o), None) => tagged(o, "delete")
      case (Some(o), Some(n)) =>
        // align schemas across the snapshots (add-column evolution): a
        // column only one side carries reads null on the other
        val fields = (o.schema.fields ++ n.schema.fields)
          .groupBy(_.name).view.mapValues(_.head).toMap
        val allCols = (o.columns ++ n.columns.filterNot(o.columns.contains)).toSeq
        def aligned(df: DataFrame): DataFrame = df.select(allCols.map { c =>
          if (df.columns.contains(c)) col(c)
          else lit(null).cast(fields(c).dataType).as(c)
        }: _*)
        val valueCols = allCols.filterNot(uniqueKeys.contains)
        def packed(df: DataFrame, as: String): DataFrame = aligned(df)
          .select(uniqueKeys.map(col) :+ struct(valueCols.map(col): _*).as(as): _*)
        // shuffles only the changed leaves' rows, keyed on the unique keys
        val joined = packed(o, "_o").join(packed(n, "_n"), uniqueKeys, "full_outer")
        val ins = struct(lit("insert").as("t"), col("_n").as("v"))
        val del = struct(lit("delete").as("t"), col("_o").as("v"))
        val pre = struct(lit("update_preimage").as("t"), col("_o").as("v"))
        val post = struct(lit("update_postimage").as("t"), col("_n").as("v"))
        // value-identical rows (a carried-through rewrite) emit nothing:
        // explode of the sliced-empty array drops the joined row
        val candidates = when(col("_o").isNull, array(ins))
          .when(col("_n").isNull, array(del))
          .when(col("_o") === col("_n"), slice(array(ins), 1, 0))
          .otherwise(array(pre, post))
        joined
          .select(uniqueKeys.map(col) :+ explode(candidates).as("_c"): _*)
          .select(col("_c.t").as("_change_type") +:
            allCols.map { c =>
              if (uniqueKeys.contains(c)) col(c) else col(s"_c.v.$c").as(c)
            }: _*)
          .withColumn("_commit_version", lit(toVersion))
    }
  }

  /** Incremental read for append-only (key-less) tables: the rows of
    * files added between two snapshots. Appends never rewrite, so this
    * IS the exact row-level delta of `append` commits; a `maintain()`
    * rewrite in the window is excluded (its files hold only carried
    * rows) by requiring the window to be rewrite-free.
    */
  def appendsBetween(fromVersion: Long, toVersion: Long): DataFrame = {
    val from = manifestAt(fromVersion).toSet
    val to = manifestAt(toVersion)
    require(from.subsetOf(to.toSet),
      s"snapshot window v$fromVersion..v$toVersion removed files (a rewrite " +
        "or delete ran); use a keyed table + changesBetween for row-level CDC")
    val added = to.filterNot(from)
    val base = if (added.isEmpty) read.limit(0)
    else {
      val df = readFileSet(added)
      if (uniqueKeys.isEmpty) df else df.drop(bucketCol)
    }
    base.withColumn("_commit_version", lit(toVersion))
  }

  /** Roll the live table back to a retained historical snapshot
    * (Iceberg's `rollback_to_snapshot`): commits a NEW version whose
    * file list is the historical manifest's. History stays create-only
    * — nothing is deleted by the rollback itself, so the rolled-over
    * versions remain readable until retention expires them, and
    * [[changesBetween]] from the bad version to the rollback commit
    * emits exactly the inverse changes (the un-do, CDC-consumable).
    * O(1) data I/O at any table size: no file is moved or rewritten,
    * the commit is one manifest create. Returns the new live version.
    */
  def rollbackTo(version: Long): Long = {
    val files = manifestAt(version)
    val (liveVersion, _) = resolveLive()
    val newVersion = nextVersion(liveVersion)
    Manifests.write(fs, root, newVersion, files)
    expireSnapshots()
    newVersion
  }

  private def manifestAt(version: Long): Seq[String] =
    Manifests.at(fs, root, version).getOrElse(
      throw new NoSuchElementException(
        s"snapshot v$version not found (expired or never committed) under $path"))

  /** The per-snapshot files of leaves whose file set differs between two
    * retained snapshots — the only leaves that can contain row changes.
    */
  private def changedLeafFiles(fromVersion: Long, toVersion: Long): (Seq[String], Seq[String]) = {
    val from = manifestAt(fromVersion)
    val to = manifestAt(toVersion)
    val fromByLeaf = from.groupBy(leafOf).view.mapValues(_.toSet).toMap
    val toByLeaf = to.groupBy(leafOf).view.mapValues(_.toSet).toMap
    val changed = (fromByLeaf.keySet ++ toByLeaf.keySet).filter { l =>
      fromByLeaf.getOrElse(l, Set.empty) != toByLeaf.getOrElse(l, Set.empty)
    }
    (from.filter(f => changed(leafOf(f))), to.filter(f => changed(leafOf(f))))
  }

  /** T3: the routing decision the transformer stamps on every record. */
  def operation: String = if (uniqueKeys.isEmpty) "insert" else "update"

  /** THE commit choreography, shared by append, upsert, and maintain:
    * stage `df` partitioned by the layout columns, import the staged
    * tree under version-unique names (dormant), then publish
    * `carryOver(imported) ++ imported` as one manifest create — the
    * commit point. `carryOver` sees the imported relative paths so
    * leaf-rewrite commits can derive "previous files outside the
    * rewritten leaves" from the actual import (never string-formatted
    * from partition values, so value escaping can't diverge).
    */
  private def commit(df: DataFrame, baseVersion: Long)(
      carryOver: Seq[String] => Seq[String]): Seq[String] = {
    val version = nextVersion(baseVersion)
    val staging = new Path(root.getParent, s".staging_v$version")
    df.write.mode("overwrite")
      .partitionBy(partCols: _*)
      .option("compression", "snappy")
      .parquet(staging.toString)
    val imported = Manifests.importStagedTree(fs, staging, root, version)
    Manifests.write(fs, root, version, carryOver(imported) ++ imported)
    fs.delete(staging, true)
    expireSnapshots()
    imported
  }

  /** Strictly increasing commit version (nanoTime ties broken upward
    * past the live version — nanoTime's origin is arbitrary across JVM
    * restarts; the single-writer invariant makes this safe).
    */
  private def nextVersion(after: Long): Long =
    math.max(System.nanoTime(), after + 1L)

  /** Retention GC, cheap per-commit half (Iceberg `expire_snapshots`):
    * drop manifests beyond `keepLast` and the expired versions' files
    * that no retained manifest still references. Manifest-driven only —
    * no directory walk — so it stays O(retained manifests) metadata I/O
    * on the ingest hot path. Runs after each commit point, never before.
    */
  private def expireSnapshots(keepLast: Int = retainVersions): Unit = {
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

  /** Full GC (explicit maintenance): [[expireSnapshots]] plus an orphan
    * sweep — a directory walk deleting every data file referenced by NO
    * retained manifest, which also clears debris from a commit that
    * crashed between its staged import and its manifest create. The
    * walk is why this is an on-demand op, not per-commit. Safe under
    * the single-writer invariant (no import can be in flight while the
    * writer runs vacuum); with concurrent readers, the same retention
    * caveat as expireSnapshots applies.
    */
  def vacuum(keepLast: Int = retainVersions): Unit = {
    expireSnapshots(keepLast)
    val referenced = versions
      .flatMap(v => Manifests.at(fs, root, v).getOrElse(Nil)).toSet
    walkDataFiles().filterNot(referenced)
      .foreach(f => fs.delete(new Path(root, f), false))
  }

  /** S10 append path (`operation='insert'`). Appends never invalidate
    * prior files, so every retained snapshot stays fully readable.
    */
  def append(df: DataFrame): Unit = {
    val (liveVersion, previous) = resolveLive()
    commit(withBucket(df), liveVersion)(_ => previous)
  }

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

    val (liveVersion, previous) = resolveLive()
    // affected (event, bucket) leaves only — bounded by the batch's
    // distinct key-derived pairs (≤ |event| × numBuckets), never by table
    // size; this collect is O(pairs), not O(data).
    val pairs = deduped.select(partitionCol, bucketCol).distinct()
      .collect().map(r => (r.get(0), r.getInt(1))).toSeq
    // an empty (or fully-invalidated) micro-batch commits nothing — the
    // reduce below would otherwise throw on zero pairs and kill the
    // foreachBatch streaming query (Ingest.startIcebergIngest).
    if (pairs.isEmpty) return
    if (previous.isEmpty) {
      commit(deduped, liveVersion)(_ => Nil)
      return
    }

    val leafPred: Column = pairs.map { case (e, b) =>
      col(partitionCol) === lit(e) && col(bucketCol) === lit(b)
    }.reduce(_ || _)
    // both predicate columns are partition columns → partition pruning
    // makes this read touch only the affected leaves' files.
    val old = readFileSet(previous).filter(leafPred)
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
    // manifest carrying over every live file OUTSIDE the rewritten
    // leaves. Readers on the previous version keep their complete file
    // set until retention expires it.
    val imported = commit(merged, liveVersion) { imp =>
      val rewrittenLeaves = imp.map(leafOf).toSet
      previous.filterNot(f => rewrittenLeaves.contains(leafOf(f)))
    }
    require(imported.nonEmpty, "merge of a non-empty batch produced no files")
  }

  private def leafOf(relFile: String): String = {
    val i = relFile.lastIndexOf('/')
    if (i < 0) "" else relFile.substring(0, i)
  }

  /** Route a batch per the deployment's T3 metadata: upsert iff keys. */
  def write(batch: DataFrame, orderCol: String): Unit =
    if (uniqueKeys.isEmpty) append(batch) else upsert(batch, orderCol)

  /** Row-level DELETE (`DELETE FROM t WHERE condition` — the GDPR
    * "erase this user" operation an Iceberg web-analytics table serves,
    * and the WHEN MATCHED THEN DELETE half of MERGE). Same rewrite unit
    * as the merge: ONLY the (event, gbucket) leaves containing matching
    * rows are rewritten (as their surviving rows), committed as one new
    * snapshot; untouched leaves carry over by reference. A leaf whose
    * rows all match simply vanishes from the new manifest. Retained
    * historical snapshots still contain the rows — after the retention
    * window ([[vacuum]]) the files are gone, which is exactly Iceberg's
    * GDPR posture (delete + expire_snapshots). Returns the number of
    * rows deleted.
    *
    * The discovery scan is column-pruned to the condition's columns plus
    * the partition columns, and the rewrite cost is bounded by the
    * affected leaves — for a key-localized predicate that is a handful
    * of leaves, never the table.
    */
  def delete(condition: Column): Long = {
    val (liveVersion, previous) = resolveLive()
    if (previous.isEmpty) return 0L
    val raw = readFileSet(previous)
    // affected leaves + deleted count in one pass over the pruned scan
    val hits = raw.filter(condition)
      .groupBy(partCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .collect()
    if (hits.isEmpty) return 0L
    val deleted = hits.map(_.getAs[Long]("_n")).sum
    val leafPred: Column = hits.map { r =>
      partCols.map(c => col(c) === lit(r.getAs[Any](c))).reduce(_ && _)
    }.reduce(_ || _)
    // leaf dir names for carry-over use Spark's own partition-path
    // escaping, so values round-trip exactly as partitionBy lays them out
    val affectedLeaves = hits.map { r =>
      partCols.map { c =>
        val v = r.getAs[Any](c)
        s"$c=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(String.valueOf(v))}"
      }.mkString("/")
    }.toSet
    // DELETE semantics: remove rows where the condition is TRUE; a NULL
    // condition keeps the row (a bare `!condition` would drop it).
    val survivors = raw.filter(leafPred)
      .filter(!coalesce(condition, lit(false)))
    commit(survivors, liveVersion)(
      _ => previous.filterNot(f => affectedLeaves.contains(leafOf(f))))
    deleted
  }

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
    val (liveVersion, previous) = resolveLive()
    if (previous.isEmpty) return Nil
    val hot = previous.groupBy(leafOf).filter(_._2.size > fileThreshold).keys.toSeq.sorted
    if (hot.isEmpty) return Nil
    val hotSet = hot.toSet
    val hotFiles = previous.filter(f => hotSet.contains(leafOf(f)))
    commit(
      readFileSet(hotFiles)
        .repartition(targetFiles * hot.size, partCols.map(col): _*),
      liveVersion)(_ => previous.filterNot(f => hotSet.contains(leafOf(f))))
    hot.map(_.stripPrefix(s"$partitionCol="))
  }
}
