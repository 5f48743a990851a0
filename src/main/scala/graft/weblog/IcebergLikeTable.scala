package graft.weblog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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
  *  - **Optimistic concurrency** (Iceberg's commit model): versions are
  *    sequential, so writers racing from the same base claim the SAME
  *    manifest name; the create-only CAS ([[Manifests.write]]) lets
  *    exactly one win, and the loser re-resolves, redoes its merge, and
  *    retries ([[withCommitRetry]]) — no lost update. The reference
  *    needs only one writer (a single Firehose stream per table,
  *    `firehose_to_iceberg.py:111-117`), but compaction/GDPR/maintenance
  *    jobs beside the ingest writer make the guard worth having.
  *  - **Exactly-once append under replay**: an `appendId = (streamId,
  *    batchId)` records a per-stream high-water mark in the manifest
  *    metadata atomically with the commit; a replayed micro-batch is
  *    skipped (see [[append]]).
  *  - **Sharded metadata** (Iceberg's manifest-list → manifest split):
  *    the version manifest is one short `@ref` line per leaf pointing
  *    at an immutable per-leaf manifest that carries the leaf's file
  *    entries — path, byte size, row count, column bounds
  *    ([[Manifests.FileEntry]]). A key-local commit writes O(changed
  *    leaves' files) metadata and re-references the rest; resolution
  *    reads only leaf manifests not already in the JVM-wide immutable
  *    cache, so a hot ingest loop pays O(changed leaves) metadata I/O
  *    per commit instead of rewriting and re-parsing the full file
  *    list — the property that keeps the driver off the critical path
  *    at millions of files. Size/row-count stamps mean read planning
  *    makes zero `listStatus` calls ([[GraftFileIndex]]) and
  *    `count(*)` can resolve from metadata alone ([[rowCount]]).
  * Readers need no coordination.
  */
final case class IcebergLikeTable(
    spark: SparkSession,
    path: String,
    partitionCol: String = "event",
    uniqueKeys: Seq[String] = Nil,
    numBuckets: Int = 16,
    retainVersions: Int = 8,
    statsColumns: Seq[String] = Nil,
    bloomColumns: Seq[String] = Nil,
    bloomExpectedItems: Long = 100000L,
    bloomFpp: Double = 0.01,
    branch: String = "main",
    partitionTransform: Option[String] = None) {

  require(branch == "main" || branch.matches("[A-Za-z0-9-]+"),
    s"branch name must be [A-Za-z0-9-]+, got '$branch'")

  /** Iceberg-style HIDDEN PARTITIONING ([[PartitionTransforms]]): when
    * declared, `partitionCol` is DERIVED from the transform's source
    * column at write (callers never supply it), hidden from user-facing
    * reads, and predicates on the SOURCE column prune partitions via
    * per-file synthesized bounds in [[prunedFiles]].
    */
  private[weblog] val transform: Option[PartitionTransforms.Transform] =
    partitionTransform.map(PartitionTransforms.parse)
  transform.foreach { t =>
    t.sources.foreach(src => require(src != partitionCol,
      s"partition transform source '$src' must differ from the " +
        s"derived partition column '$partitionCol'"))
    require(!uniqueKeys.contains(partitionCol),
      "a derived partition column cannot be a unique key")
  }

  /** Derive the hidden partition value when the table declares a
    * transform. Whenever the SOURCE column is present the value is
    * (re-)derived under THIS handle's spec — deterministic, so an
    * unevolved table writes the same values it always did, and on a
    * spec-evolved table every rewrite (maintain, copy-on-write delete)
    * migrates the rows it touches to the current spec, keeping the
    * invariant [[transformBounds]] prunes by: a data file written at
    * version v carries partition values derived under v's governing
    * spec. A frame carrying the partition column but NOT the source
    * (e.g. CDC envelopes mirrored table-to-table) passes through
    * unchanged.
    */
  private def withDerivedPartition(df: DataFrame): DataFrame =
    transform match {
      case Some(t) if t.sources.forall(df.columns.contains) =>
        df.withColumn(partitionCol, t.derive)
      case _ => df
    }

  /** Hide layout columns from a user-facing frame: the key bucket
    * (keyed tables) and the derived partition column (hidden
    * partitioning) are physical routing, not schema.
    */
  private def userFacing(df: DataFrame): DataFrame = {
    val drops = (if (uniqueKeys.isEmpty) Nil else Seq(bucketCol)) ++
      (if (transform.isDefined) Seq(partitionCol) else Nil)
    if (drops.isEmpty) df else df.drop(drops: _*)
  }

  /** This handle's version-chain prefix: the main chain keeps the
    * original manifest names; a BRANCH (Iceberg refs / the
    * write-audit-publish staging pattern) is an independent version
    * chain in the same table root whose manifests reference the same
    * immutable leaf manifests and data files. All chains share one GC
    * referenced-set (see [[expireVersions]]), so no chain can sweep a
    * file another still references.
    */
  private def chainPrefix: String =
    if (branch == "main") Manifests.Prefix else s"_graft_branch_${branch}_v"

  require(retainVersions >= 1, "retainVersions must keep at least the live snapshot")

  private def root = new Path(path)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Internal sub-bucket column (keyed tables only). Must not start with
    * `_`/`.` — Spark's file index treats such directories as hidden.
    */
  val bucketCol = "gbucket"

  private[weblog] def partCols: Seq[String] =
    if (uniqueKeys.isEmpty) Seq(partitionCol) else Seq(partitionCol, bucketCol)

  private def withBucket(df: DataFrame): DataFrame =
    if (uniqueKeys.isEmpty) df
    else df.withColumn(bucketCol,
      pmod(xxhash64(uniqueKeys.map(col): _*), lit(numBuckets.toLong)).cast("int"))

  def exists: Boolean = fs.exists(root)

  /** Committed snapshot versions, ascending (within retention). */
  def versions: Seq[Long] = Manifests.versions(fs, root, chainPrefix)

  /** The live snapshot version, if the table has committed at all. */
  def currentVersion: Option[Long] = versions.lastOption

  import IcebergLikeTable.TableSnapshot

  /** Expand a raw version manifest into a [[TableSnapshot]]: `@ref`
    * lines resolve through the (immutable, JVM-cached) leaf manifests —
    * a hot loop re-reads only refs it has not seen, O(changed leaves)
    * metadata I/O per resolution; plain lines are legacy monolithic
    * entries (size/rowCount unknown, stats from the old meta key).
    */
  private def expand(snap: Manifests.Snapshot): TableSnapshot = {
    val (refLines, plain) = snap.files.partition(_.startsWith(Manifests.RefMark))
    val refs = refLines.map(_.stripPrefix(Manifests.RefMark))
    val legacyStats = snap.meta.get(StatsKey).map(FileStats.fromJson)
      .getOrElse(Map.empty[String, Map[String, (String, String)]])
    val legacy = plain.map(f =>
      Manifests.FileEntry(f, -1L, -1L, legacyStats.getOrElse(f, Map.empty)))
    val expanded = refs.flatMap(n => Manifests.readLeafManifest(fs, root, n))
    TableSnapshot(legacy ++ expanded, snap.meta, refs)
  }

  /** The refs of a snapshot keyed by the leaf they describe (one leaf
    * manifest covers exactly one leaf by construction), with the
    * entry-path set each contributes — the commit-time reuse index.
    */
  private def refsByLeaf(snap: TableSnapshot): Map[String, (String, Set[String])] =
    snap.refs.map { n =>
      val entries = Manifests.readLeafManifest(fs, root, n)
      val leaf = entries.headOption.map(e => leafOf(e.path)).getOrElse("")
      leaf -> (n, entries.map(_.path).toSet)
    }.toMap

  /** The live (version, snapshot) pair, resolved in ONE metadata round
    * trip per operation — (0, empty) for a table that has never
    * committed. Data files on disk but in no manifest are dormant by
    * protocol (debris of a crashed or conflict-losing commit at worst)
    * and are never read; [[vacuum]] sweeps them.
    */
  private[weblog] def resolveLive(): (Long, TableSnapshot) =
    Manifests.versions(fs, root, chainPrefix).lastOption
      .flatMap(v => Manifests.snapshotAt(fs, root, v, chainPrefix)
        .map(sn => (v, expand(sn))))
      .getOrElse((0L, TableSnapshot(Nil, Map.empty, Nil)))

  /** Manifest metadata key holding the table schema (StructType JSON) —
    * read planning resolves schema from here, not from parquet footers.
    */
  private val SchemaKey = "schema"

  /** Manifest metadata key prefix for per-stream append high-water
    * marks (exactly-once micro-batch replay; see [[append]]).
    */
  private val HwmPrefix = "hwm."

  /** Manifest metadata key holding the commit wall-clock timestamp
    * (epoch millis), stamped at every commit — [[expireOlderThan]]'s
    * time-based retention and the `snapshots` metadata table read it.
    */
  private val TsKey = "committs"

  /** Manifest metadata key holding the table's LAYOUT SPEC
    * (`partitionCol/bucketCol-count/keys`): the physical routing every
    * keyed merge assumes. Stamped at every commit and VALIDATED against
    * this instance's declaration before one — re-opening a table with a
    * different `numBuckets` (or keys/partition column) would otherwise
    * silently hash keys into the wrong leaves and duplicate rows across
    * buckets. Change the layout with [[rebucket]], never by
    * redeclaring.
    */
  private val LayoutKey = "layout"

  private def layoutSpec: String = layoutSpecFor(transform)

  private def layoutSpecFor(t: Option[PartitionTransforms.Transform]): String = {
    val p = t.fold(partitionCol)(tt => s"$partitionCol=${tt.spec}")
    if (uniqueKeys.isEmpty) p
    else s"$p/$bucketCol-$numBuckets/${uniqueKeys.mkString("+")}"
  }

  /** Manifest metadata key holding a hidden-partitioned table's
    * PARTITION-SPEC HISTORY (Iceberg's spec-id evolution): JSON
    * `[[fromVersion, spec], ...]`, ascending — the spec governing a
    * data file is the entry with the greatest fromVersion <= the
    * file's write version (parsed from its immutable imported name,
    * [[fileVersionOf]]). Absent until the first
    * [[evolvePartitionSpec]]; carried forward by every commit; a
    * single-entry history applies its spec to every file regardless of
    * version (the post-collapse / never-evolved fast path).
    */
  private[weblog] val SpecHistKey = "spechist"

  private def specHistOf(meta: Map[String, String]): Seq[(Long, String)] =
    meta.get(SpecHistKey).map { j =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
      val b = Seq.newBuilder[(Long, String)]
      m.forEach(pair => b += ((pair.get(0).asLong, pair.get(1).asText)))
      b.result()
    }.getOrElse(Nil)

  private def specHistJson(hist: Seq[(Long, String)]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createArrayNode()
    hist.foreach { case (v, s) =>
      val pair = node.addArray(); pair.add(v); pair.add(s)
    }
    m.writeValueAsString(node)
  }

  /** Manifest metadata key holding the table's CHECK constraints as a
    * JSON object (name → predicate SQL) — table state, like the schema
    * stamp, so the constraints travel with the data across catalogs.
    */
  private[weblog] val ConstraintsKey = "constraints"

  private def constraintsOf(meta: Map[String, String]): Map[String, String] =
    meta.get(ConstraintsKey).map { j =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
      val b = Map.newBuilder[String, String]
      m.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText)
      b.result()
    }.getOrElse(Map.empty)

  private def constraintsJson(cs: Map[String, String]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    cs.toSeq.sortBy(_._1).foreach { case (n, s) => node.put(n, s) }
    m.writeValueAsString(node)
  }

  /** The live CHECK constraints (name → predicate SQL). ANSI
    * semantics: a row violates only when the predicate evaluates
    * FALSE; NULL (SQL's UNKNOWN) passes.
    */
  def constraints: Map[String, String] = constraintsOf(resolveLive()._2.meta)

  /** Per-row CHECK enforcement at THE single write point ([[commit]]):
    * each constraint compiles to a codegen'd guard inside the staging
    * write's own plan — zero extra passes over the data. A violating
    * row throws BEFORE the manifest create, so a failed write never
    * publishes partial state (the normal abort path cleans the staged
    * files). NULL predicate results pass (ANSI CHECK).
    */
  private def guardConstraints(df: DataFrame,
      cs: Map[String, String]): DataFrame =
    if (cs.isEmpty) df
    else cs.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (n, sqlText)) =>
      val ok = coalesce(expr(sqlText).cast("boolean"), lit(true))
      acc.filter(when(ok, lit(true)).otherwise(raise_error(concat(
        lit(s"CHECK constraint '$n' ($sqlText) violated by row: "),
        to_json(struct(df.columns.toSeq.map(col): _*))))))
    }

  /** Add a CHECK constraint (Delta's `ALTER TABLE ADD CONSTRAINT`,
    * ANSI CHECK semantics — NULL passes). EXISTING live rows are
    * validated first (one scan, stops at the first violation), then
    * the constraint lands as a METADATA-ONLY commit; from that commit
    * on EVERY write path — append, upsert, MERGE, UPDATE, the
    * overwrite family, compaction rewrites — enforces it per row
    * inside the write plan. Returns the new live version.
    */
  def addConstraint(name: String, predicateSql: String): Long =
    withCommitRetry {
      require(name.matches("[A-Za-z0-9_-]+"),
        s"constraint name must be [A-Za-z0-9_-]+, got '$name'")
      // the constraint lives in manifest meta, so the table needs a
      // first (possibly empty) commit to carry it — the SQL catalog
      // materializes one automatically; direct API callers commit first
      require(currentVersion.isDefined,
        s"addConstraint needs a committed table under $path — commit " +
          "first (an empty append materializes the schema stamp)")
      val (liveVersion, snap) = resolveLive()
      validateLayout(snap.meta)
      val existing = constraintsOf(snap.meta)
      require(!existing.contains(name), s"constraint '$name' already exists")
      // the predicate must ANALYZE against the table schema NOW — a
      // typo accepted here would fail every subsequent write instead
      val probe = userFacing(readSnapshot(
        if (snap.dataFiles.nonEmpty) snap else snap.copy(entries = Nil)))
      val ok = coalesce(expr(predicateSql).cast("boolean"), lit(true))
      val analyzed = probe.filter(!ok)
      analyzed.queryExecution.assertAnalyzed()
      if (snap.dataFiles.nonEmpty) {
        val bad = analyzed.limit(1).count()
        require(bad == 0L,
          s"cannot add CHECK constraint '$name' ($predicateSql): " +
            "existing rows violate it")
      }
      val version = nextVersion(liveVersion)
      // a normal commit drops the fast-forward ancestry mark (a later
      // fastForward must see divergence, not silently clobber this)
      val meta = snap.meta - FfKey +
        (ConstraintsKey -> constraintsJson(existing + (name -> predicateSql))) +
        (TsKey -> System.currentTimeMillis().toString)
      val lines =
        if (snap.refs.nonEmpty) snap.refs.map(Manifests.RefMark + _)
        else snap.files
      Manifests.write(fs, root, version, lines, meta, chainPrefix)
      expireSnapshots()
      version
    }

  /** ANALYZE (Iceberg's compute-stats / Hive's ANALYZE TABLE): read the
    * live data ONCE (a single grouped aggregate — one pass, bounded by
    * table bytes, never loaded to the driver beyond one row per file)
    * and commit fresh per-file statistics under the SAME data paths:
    * row counts (legacy -1 entries get fixed — an un-stamped table
    * gains native-scan eligibility and manifest-only counts), [min,
    * max] bounds, NULL counts and HLL NDV sketches for `columns`
    * (default: the declared stats columns). Data files are untouched —
    * the commit rewrites leaf MANIFESTS only, so cost is one scan plus
    * O(leaves) metadata writes; time travel keeps the old stamps.
    * Stamps refresh for every LIVE data file, so the manifest-only
    * aggregate/pruning paths that refuse on any-unstamped-entry light
    * up table-wide. Columns outside the declared `statsColumns` stay
    * analyzed-only: FUTURE commits stamp the declared set, so declare
    * the columns too if new files should keep the stats current.
    */
  def analyze(columns: Seq[String] = Nil): Long = withCommitRetry {
    require(currentVersion.isDefined,
      s"analyze needs a committed table under $path")
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta)
    val schema = storedSchema(snap.meta).getOrElse(
      throw new IllegalStateException(
        s"analyze needs a schema-stamped table under $path (commit once " +
          "with this engine version first)"))
    val requested = (if (columns.nonEmpty) columns else statsCols).distinct
    val cols = requested.filter(c =>
      schema.fields.exists(f => f.name == c && FileStats.supported(f.dataType)))
    // declared Bloom columns backfill too — file contents are
    // immutable, so a sidecar computed now stays valid forever and
    // point-lookup pruning lights up on files stamped before the
    // columns were declared
    val bCols = bloomColumns.distinct.filter(c =>
      schema.fields.exists(_.name == c))
    val dataEntries = snap.dataEntries
    if (dataEntries.isEmpty) return liveVersion
    // one pass: per-file row count + per-column bounds/nulls/NDV (+
    // Bloom filters) — the same aggregate shape the commit path stamps
    // batches with, here over the whole live file set (epoch-aware
    // scan, so renamed tables analyze under their current names)
    def typeOf(c: String) = schema.fields.find(_.name == c).get.dataType
    val aggs = (count(lit(1)).as("_rc") +:
      cols.flatMap(c => Seq(
        FileStats.boundRender(min(col(c)), typeOf(c)).as(s"_lo_$c"),
        FileStats.boundRender(max(col(c)), typeOf(c)).as(s"_hi_$c"),
        count(col(c)).as(s"_nn_$c"),
        base64(hll_sketch_agg(col(c).cast("string"),
          IcebergLikeTable.NdvSketchLgK)).as(s"_dv_$c")) ++
        IcebergLikeTable.sumCastType(
            schema.fields.find(_.name == c).get.dataType).map(dec =>
          sum(col(c).cast(dec)).cast("string").as(s"_sm_$c")))) ++
      bCols.map(c =>
        BloomStats.bloomAgg(xxhash64(col(c)), bloomExpectedItems, bloomFpp)
          .as(s"_bf_$c"))
    val perFile = readFileSetEvolved(snap, dataEntries.map(_.path))
      .groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val uri = r.getString(0)
        uri.substring(uri.lastIndexOf('/') + 1) -> r
      }.toMap
    val restamped = dataEntries.map { e =>
      perFile.get(e.path.substring(e.path.lastIndexOf('/') + 1)) match {
        case None => e // an empty file produces no group: keep as-is
        case Some(r) =>
          val rc = r.getAs[Long]("_rc")
          val bounds = cols.flatMap { c =>
            (Option(r.getAs[String](s"_lo_$c")),
              Option(r.getAs[String](s"_hi_$c"))) match {
              case (Some(lo), Some(hi)) => Some(c -> (lo, hi))
              case _ => None // all-null in this file
            }
          }.toMap
          val nulls = cols.map(c => c -> (rc - r.getAs[Long](s"_nn_$c"))).toMap
          val ndv = cols.flatMap(c =>
            Option(r.getAs[String](s"_dv_$c")).map(c -> _)).toMap
          val sums = cols.flatMap(c =>
            IcebergLikeTable.sumStamp(r, c, nulls.getOrElse(c, 0L), rc)
              .map(c -> _)).toMap
          e.copy(rowCount = rc,
            stats = e.stats ++ bounds,
            nulls = e.nulls ++ nulls,
            ndv = e.ndv ++ ndv,
            sums = e.sums ++ sums)
      }
    }
    val version = nextVersion(liveVersion)
    val token = java.util.UUID.randomUUID().toString.take(8)
    // fresh Bloom sidecar covering EVERY analyzed file (old sidecars
    // for the same files stay valid — file contents are immutable —
    // and expire with the manifests that reference them). A previous
    // analyze sidecar is superseded by this one; per-commit sidecars
    // keep covering their own imports.
    val perFileBlooms: BloomStats.Sidecar =
      if (bCols.isEmpty) Map.empty
      else dataEntries.flatMap { e =>
        perFile.get(e.path.substring(e.path.lastIndexOf('/') + 1)).map { r =>
          e.path -> bCols.map(c => c -> r.getAs[Array[Byte]](s"_bf_$c")).toMap
        }
      }.toMap
    val bloom: Map[String, String] =
      if (perFileBlooms.isEmpty) Map.empty
      else {
        val name = s"${IcebergLikeTable.AnalyzeBloomPrefix}v${version}_$token"
        BloomStats.write(fs, new Path(root, name), perFileBlooms)
        val kept = bloomSidecarsOf(snap.meta)
          .filterNot(_.startsWith(IcebergLikeTable.AnalyzeBloomPrefix))
        Map(BloomKey -> (kept :+ name).mkString(","))
      }
    val meta = snap.meta - FfKey ++ bloom +
      (TsKey -> System.currentTimeMillis().toString)
    try publishVersion(version, token, restamped ++ snap.deleteEntries, meta,
      snap, reuseBaseLeaves = false)
    catch {
      case e: Manifests.CommitConflictException =>
        // lost the race: un-write this attempt's sidecar (retry writes
        // a fresh one under its own token)
        if (bloom.nonEmpty) fs.delete(new Path(root,
          s"${IcebergLikeTable.AnalyzeBloomPrefix}v${version}_$token"), false)
        throw e
    }
    expireSnapshots()
    version
  }

  /** Drop a CHECK constraint — metadata-only commit. */
  def dropConstraint(name: String): Long = withCommitRetry {
    val (liveVersion, snap) = resolveLive()
    val existing = constraintsOf(snap.meta)
    require(existing.contains(name), s"no constraint '$name' to drop")
    val version = nextVersion(liveVersion)
    val meta = snap.meta - FfKey +
      (ConstraintsKey -> constraintsJson(existing - name)) +
      (TsKey -> System.currentTimeMillis().toString)
    val lines =
      if (snap.refs.nonEmpty) snap.refs.map(Manifests.RefMark + _)
      else snap.files
    Manifests.write(fs, root, version, lines, meta, chainPrefix)
    expireSnapshots()
    version
  }

  /** Parsed-transform cache: pruning resolves a governing spec per
    * file, and the handful of distinct spec strings parse once.
    */
  private val specCache =
    new java.util.concurrent.ConcurrentHashMap[String, PartitionTransforms.Transform]()
  private def transformOf(spec: String): PartitionTransforms.Transform =
    specCache.computeIfAbsent(spec, s => PartitionTransforms.parse(s))

  private def validateLayout(meta: Map[String, String]): Unit =
    meta.get(LayoutKey).foreach { stored =>
      require(stored == layoutSpec,
        s"table at $path was written with layout '$stored' but this instance " +
          s"declares '$layoutSpec' — keyed routing would corrupt the table; " +
          "open it with the original declaration (or rebucket() to change it)")
    }

  /** Manifest metadata key recording a BRANCH's branch-point: the main
    * chain's live version at [[createBranch]] time, carried forward by
    * every branch commit — [[fastForward]]'s ancestry check reads it
    * (real Iceberg's fast_forward fails unless the current ref is an
    * ancestor of the source; without the check a 'fast-forward' would
    * silently DISCARD commits that landed on the target after the
    * branch was cut).
    */
  private val BranchBaseKey = "branchbase"

  /** Manifest metadata key stamped by a [[fastForward]] commit naming
    * the branch it published from: a SECOND fast-forward from the same
    * branch is still an ancestry-preserving publish (the target's live
    * snapshot IS the branch's earlier state), while any normal commit
    * in between drops the key and correctly turns the next
    * fast-forward into a divergence error.
    */
  private val FfKey = "fffrom"

  /** Manifest metadata key holding the STABLE COLUMN IDS (JSON
    * name→id) — Iceberg's column-id indirection, realized through
    * parquet FIELD IDS: every commit stamps each schema field (and the
    * staged parquet files) with its id via Spark's native
    * `parquet.field.id` support, so the reader matches columns by ID,
    * not name. That makes [[renameColumn]] a metadata-only commit that
    * still reads every historical file correctly, and a dropped-then-
    * re-added column a NEW id that never resurrects the old data —
    * real Iceberg rename/drop semantics with zero custom reader code.
    */
  private val ColIdsKey = "colids"

  /** Manifest metadata key recording the version of the FIRST
    * id-stamped commit: files written before it carry no parquet field
    * ids (the write version is parsed from the immutable file name),
    * and [[renameColumn]] refuses until [[maintain]] has rewritten
    * them — an un-stamped file under a renamed schema would silently
    * read null.
    */
  private val IdsFromKey = "idsfrom"

  private val FieldIdKey = "parquet.field.id"

  private def colIdsOf(meta: Map[String, String]): Map[String, Int] =
    meta.get(ColIdsKey).map { j =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
      val b = Map.newBuilder[String, Int]
      m.properties().forEach(e => b += e.getKey -> e.getValue.asInt)
      b.result()
    }.getOrElse(Map.empty)

  private def idsJson(ids: Map[String, Int]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    ids.toSeq.sortBy(_._2).foreach { case (n, i) => node.put(n, i) }
    m.writeValueAsString(node)
  }

  /** Carry prior ids, assign fresh ones (max+1 onward, field order) to
    * genuinely new columns.
    */
  private def assignIds(prev: Map[String, Int], schema: StructType): Map[String, Int] = {
    var next = (prev.values ++ Seq(0)).max
    prev ++ schema.fields.filterNot(f => prev.contains(f.name)).map { f =>
      next += 1
      f.name -> next
    }
  }

  /** The schema with each field's stable id attached as parquet
    * field-id metadata (what both the schema stamp and the staged
    * write carry).
    */
  private def withFieldIds(schema: StructType, ids: Map[String, Int]): StructType =
    StructType(schema.fields.map { f =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .putLong(FieldIdKey, ids(f.name).toLong)
      StructField(f.name, f.dataType, f.nullable, mb.build())
    })

  /** Field ids are STAMPED into written files (interop with id-aware
    * engines) but reads deliberately do NOT rely on parquet field-id
    * matching: Spark's parquet FILTER PUSHDOWN matches row-group stats
    * by NAME regardless of ids, so an id-matched read of a renamed
    * column would pair a pushed filter with the WRONG physical column
    * and silently drop rows (observed: IsNull(renamed) pruning row
    * groups of the old column). Instead the reader resolves each
    * file's PHYSICAL column names from the manifest's column history
    * ([[ColHistKey]]) and requests exactly those — names always match
    * the footer, so pushdown is safe by construction.
    */
  private def ensureFieldIdConfs(): Unit =
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")

  /** Manifest metadata key holding each column id's PHYSICAL-NAME
    * HISTORY: JSON `{id: [[fromVersion, name|null], ...]}` — the name
    * a file written at version v carries for that column is the entry
    * with the greatest fromVersion <= v (`null` = released by a drop).
    * A file older than a column's first entry does not have it (so a
    * dropped-then-re-added name can never resurrect old values), and a
    * renamed column keeps its id while gaining a new name entry.
    * Dropped ids KEEP their history (with a null terminator) — it is
    * what proves an old same-named physical column belongs to a dead
    * id. Carried forward by every commit.
    */
  private val ColHistKey = "colhist"

  private def colHistOf(meta: Map[String, String]): Map[Int, Seq[(Long, Option[String])]] =
    meta.get(ColHistKey).map { j =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
      val b = Map.newBuilder[Int, Seq[(Long, Option[String])]]
      m.properties().forEach { e =>
        val entries = Seq.newBuilder[(Long, Option[String])]
        e.getValue.forEach { arr =>
          entries += ((arr.get(0).asLong,
            if (arr.get(1).isNull) None else Some(arr.get(1).asText)))
        }
        b += e.getKey.toInt -> entries.result()
      }
      b.result()
    }.getOrElse(Map.empty)

  private def histJson(hist: Map[Int, Seq[(Long, Option[String])]]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    hist.toSeq.sortBy(_._1).foreach { case (id, entries) =>
      val arr = node.putArray(id.toString)
      entries.foreach { case (v, n) =>
        val pair = arr.addArray()
        pair.add(v)
        n match { case Some(s) => pair.add(s); case None => pair.addNull() }
      }
    }
    m.writeValueAsString(node)
  }

  /** Has this table ever renamed or dropped a column? Only then do
    * per-epoch physical names diverge and reads take the epoch-union
    * path; the overwhelmingly common never-evolved table keeps the
    * single-scan plan bit for bit.
    */
  private def hasEvolution(hist: Map[Int, Seq[(Long, Option[String])]]): Boolean =
    hist.exists(_._2.size > 1)

  /** A data file's write version parsed from its immutable imported
    * name (`part-v<version>-…`); None for foreign/legacy names.
    */
  private[weblog] def fileVersionOf(relFile: String): Option[Long] = {
    val name = relFile.substring(relFile.lastIndexOf('/') + 1)
    "^part-v(\\d+)-".r.findFirstMatchIn(name).flatMap(_.group(1).toLongOption)
  }

  /** LEGACY manifest metadata key for monolithic per-file column
    * bounds. Current commits stamp bounds into the per-leaf manifest
    * entries instead ([[Manifests.FileEntry]]); this key is only read
    * when expanding a manifest written before the sharded layout.
    */
  private[weblog] val StatsKey = "stats"

  private def statsCols: Seq[String] =
    (if (statsColumns.nonEmpty) statsColumns else uniqueKeys).distinct

  /** Per-imported-file metadata in ONE aggregate over the just-written
    * batch, grouped by file: row count (always — it feeds the manifest
    * entry and manifest-only `count(*)`), min/max bounds for the
    * supported `statsColumns`, and the per-column Bloom filters for
    * `bloomColumns`. Cost is bounded by the batch, never the table, and
    * folding all three into one pass means a commit re-reads its batch
    * exactly once.
    */
  private def importedFileMeta(imported: Seq[String], schema: StructType):
      Map[String, IcebergLikeTable.ImportedMeta] = {
    if (imported.isEmpty) return Map.empty
    val sCols = statsCols.filter(c =>
      schema.fields.exists(f => f.name == c && FileStats.supported(f.dataType)))
    val bCols = bloomColumns.distinct.filter(c => schema.fields.exists(_.name == c))
    val byName = imported.map(f => f.substring(f.lastIndexOf('/') + 1) -> f).toMap
    def typeOf(c: String) = schema.fields.find(_.name == c).get.dataType
    val aggs = (count(lit(1)).as("_rc") +:
      sCols.flatMap(c => Seq(
        FileStats.boundRender(min(col(c)), typeOf(c)).as(s"_lo_$c"),
        FileStats.boundRender(max(col(c)), typeOf(c)).as(s"_hi_$c"),
        // r11 column statistics: per-file null count and a MERGEABLE
        // DataSketches-HLL distinct sketch (over the string rendering —
        // type-uniform, injective for the stamped primitive types) —
        // the native scan unions these across pruned files so the CBO
        // sees NDV/null counts at plan time, zero data I/O
        count(col(c)).as(s"_nn_$c"),
        base64(hll_sketch_agg(col(c).cast("string"),
          IcebergLikeTable.NdvSketchLgK)).as(s"_dv_$c")) ++
        // r11 SUM stamp: the file's exact non-null sum at 38-digit
        // decimal precision (NULL = all-null or a per-file overflow —
        // the extraction distinguishes via the non-null count)
        IcebergLikeTable.sumCastType(
            schema.fields.find(_.name == c).get.dataType).map(dec =>
          sum(col(c).cast(dec)).cast("string").as(s"_sm_$c")))) ++
      bCols.map(c =>
        BloomStats.bloomAgg(xxhash64(col(c)), bloomExpectedItems, bloomFpp).as(s"_bf_$c"))
    readFileSet(imported, Some(schema))
      .groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap { r =>
        val uri = r.getString(0)
        byName.get(uri.substring(uri.lastIndexOf('/') + 1)).map { rel =>
          val rc = r.getAs[Long]("_rc")
          val stats = sCols.flatMap { c =>
            (Option(r.getAs[String](s"_lo_$c")), Option(r.getAs[String](s"_hi_$c"))) match {
              case (Some(lo), Some(hi)) => Some(c -> (lo, hi))
              case _ => None // all-null column in this file: no bounds
            }
          }.toMap
          val blooms = bCols.map(c => c -> r.getAs[Array[Byte]](s"_bf_$c")).toMap
          val nulls = sCols.map(c => c -> (rc - r.getAs[Long](s"_nn_$c"))).toMap
          val ndv = sCols.flatMap(c =>
            Option(r.getAs[String](s"_dv_$c")).map(c -> _)).toMap
          val sums = sCols.flatMap(c =>
            IcebergLikeTable.sumStamp(r, c, nulls.getOrElse(c, 0L), rc)
              .map(c -> _)).toMap
          rel -> IcebergLikeTable.ImportedMeta(rc, stats, blooms, nulls, ndv,
            sums)
        }
      }.toMap
  }

  /** Manifest metadata key listing the live Bloom SIDECAR file names
    * (comma-joined) — see [[BloomStats]]; loaded lazily at readWhere
    * planning, GC'd with the snapshots that reference them.
    */
  private[weblog] val BloomKey = "bloomfiles"

  private[weblog] def bloomSidecarsOf(meta: Map[String, String]): Seq[String] =
    meta.get(BloomKey).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** Write the per-file Bloom sidecar for this commit's imported files;
    * returns the metadata entry (carried sidecar names + the new one).
    * One aggregate over the just-written files, like the stats stamp.
    * A carried sidecar whose commit's data files have ALL left the
    * snapshot is dropped from the reference list (sidecar and data
    * names share the `v<version>-<token>` tag, so liveness is a string
    * check against `fileList` — no sidecar reads), which caps the
    * sidecar count at the live-commit count; GC deletes the files once
    * their last referencing manifest expires.
    */
  private def bloomMeta(baseMeta: Map[String, String], fileList: Seq[String],
      perFile: BloomStats.Sidecar, version: Long,
      token: String): Map[String, String] = {
    val liveNames = fileList.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val carried = bloomSidecarsOf(baseMeta).filter { n =>
      // ANALYZE sidecars cover a whole-table snapshot, not one
      // commit's imports — they carry unconditionally (the next
      // analyze replaces them; GC sweeps them with their manifests)
      n.startsWith(IcebergLikeTable.AnalyzeBloomPrefix) || {
        val tag = n.stripPrefix("_graft_bloom_").split("_", 2)
        tag.length == 2 && liveNames.exists(_.startsWith(s"part-${tag(0)}-${tag(1)}-"))
      }
    }
    if (perFile.isEmpty)
      return if (carried.isEmpty) Map.empty else Map(BloomKey -> carried.mkString(","))
    val name = s"_graft_bloom_v${version}_$token"
    BloomStats.write(fs, new Path(root, name), perFile)
    Map(BloomKey -> (carried :+ name).mkString(","))
  }

  private[weblog] def storedSchema(meta: Map[String, String]): Option[StructType] =
    meta.get(SchemaKey).map(j => DataType.fromJson(j).asInstanceOf[StructType])

  /** URL-encoding keeps arbitrary stream ids (checkpoint paths) inside
    * the manifest header's single-line, '='-free key grammar, injectively.
    */
  private def hwmKey(streamId: String): String =
    HwmPrefix + java.net.URLEncoder.encode(streamId, "UTF-8")

  private def hwmOf(meta: Map[String, String]): Map[String, String] =
    meta.view.filterKeys(_.startsWith(HwmPrefix)).toMap

  /** The committed per-stream append high-water mark, if any — the
    * replay cursor [[append]]'s `appendId` maintains. Incremental
    * consumers (e.g. [[MaterializedAgg]]) read their own cursor from
    * here: it was committed atomically with the data they derived.
    */
  def appendHighWaterMark(streamId: String): Option[Long] =
    resolveLive()._2.meta.get(hwmKey(streamId)).flatMap(_.toLongOption)

  /** True iff this (streamId, batchId) append was already committed —
    * the batch is a micro-batch replay and must be skipped.
    */
  private def alreadyApplied(meta: Map[String, String],
      appendId: Option[(String, Long)]): Boolean =
    appendId.exists { case (stream, batch) =>
      meta.get(hwmKey(stream)).flatMap(_.toLongOption).exists(_ >= batch)
    }

  /** The committed table schema for this commit: stored data fields
    * first (in stored order), genuinely new data fields appended, layout
    * /partition fields last — the same column order a footer-merged read
    * produced, so stamping the schema is invisible to readers. Shared
    * names must type-match: schema evolution is add-column-only.
    */
  private def commitSchema(prev: Option[StructType], df: StructType): StructType = {
    prev.foreach { p =>
      val pTypes = p.fields.map(f => f.name -> f.dataType).toMap
      df.fields.foreach { f =>
        pTypes.get(f.name).foreach { t =>
          require(nullableOf(t) == nullableOf(f.dataType),
            s"schema evolution is add-column-only: column '${f.name}' is $t " +
              s"in the table but ${f.dataType} in this commit")
        }
      }
    }
    def dataFields(s: StructType): Array[StructField] =
      s.fields.filterNot(f => partCols.contains(f.name))
    val prevData = prev.map(dataFields).getOrElse(Array.empty[StructField])
    val prevNames = prevData.map(_.name).toSet
    val newData = dataFields(df).filterNot(f => prevNames.contains(f.name))
    val partFields = partCols.map { c =>
      df.fields.find(_.name == c)
        .orElse(prev.flatMap(_.fields.find(_.name == c)))
        .getOrElse(throw new IllegalArgumentException(
          s"commit is missing partition column '$c'"))
    }
    // everything nullable: evolved reads null-fill rows written before a
    // column existed, so no field can promise non-null across versions
    StructType((prevData ++ newData ++ partFields)
      .map(f => StructField(f.name, nullableOf(f.dataType), nullable = true)))
  }

  /** Recursively nullable twin of a type — nullability is a property of
    * the rows a field happened to hold, not of table identity, so
    * stored-vs-commit comparison and the stamped schema both normalize.
    */
  private def nullableOf(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        StructField(f.name, nullableOf(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      org.apache.spark.sql.types.ArrayType(nullableOf(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      org.apache.spark.sql.types.MapType(
        nullableOf(m.keyType), nullableOf(m.valueType), valueContainsNull = true)
    case other => other
  }

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
    *
    * Schema comes from the manifest stamp (like real Iceberg's table
    * metadata): planning opens ZERO parquet footers, an O(1) win over
    * footer-merge that matters at millions of files, and files written
    * before a column was added read null for it (add-column evolution)
    * because the parquet reader matches fields by name. Manifests from
    * before the stamp existed (no `schema` meta) fall back to the old
    * `mergeSchema` footer union. A snapshot whose file list is empty
    * (e.g. a [[delete]] erased every row) reads as an empty, correctly
    * typed DataFrame when the schema is stamped.
    */
  private def readFileSet(files: Seq[String],
      schema: Option[StructType], withPos: Boolean = false): DataFrame = {
    // positional deletes address rows by (file, ordinal); the ordinal
    // must come from the parquet reader's own `_metadata.row_index`
    // (files SPLIT across Spark partitions, so no hand-rolled counter
    // is correct) and is only resolvable ON the scan — attach it here.
    def attach(df: DataFrame): DataFrame =
      if (withPos) df.select(col("*"),
        col("_metadata.row_index").as(PosCol))
      else df
    ({ ensureFieldIdConfs(); schema }) match {
      case Some(s) if files.isEmpty =>
        val s2 = if (withPos)
          StructType(s.fields :+ StructField(PosCol, LongType)) else s
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s2)
      case Some(s) =>
        attach(spark.read.option("basePath", path).schema(s)
          .parquet(files.map(f => s"$path/$f"): _*))
      case None =>
        require(files.nonEmpty, s"empty snapshot under $path")
        attach(spark.read.option("basePath", path).option("mergeSchema", "true")
          .parquet(files.map(f => s"$path/$f"): _*))
    }
  }

  /** Whether reads of this snapshot must carry the per-file row ordinal
    * (it has live POSITIONAL delete files to anti-join).
    */
  private def needsPos(snap: TableSnapshot): Boolean =
    snap.deleteEntries.exists(e => Manifests.isPosDelete(e.path))

  /** The standard merge-on-read read of a snapshot file subset: the
    * epoch-aware scan (row ordinals attached iff positional delete
    * files are live) with every live delete file applied, helper
    * columns dropped. ALL user-facing reads compose through this.
    */
  private def morRead(snap: TableSnapshot, files: Seq[String]): DataFrame = {
    val pos = needsPos(snap)
    val df = applyDeletes(snap, readFileSetEvolved(snap, files, pos))
    if (pos) df.drop(PosCol) else df
  }

  private def readSnapshot(snap: TableSnapshot): DataFrame =
    morRead(snap, snap.dataFiles)

  /** Epoch-aware snapshot read: when the table has renamed/dropped
    * columns, files from different schema epochs carry different
    * physical column names — each epoch group is read under ITS
    * physical names (so parquet filter pushdown matches the footers it
    * prunes against) and projected back to the current schema, with
    * columns the epoch predates — including a re-added name whose old
    * physical twin belongs to a dead id — EXCLUDED from the scan and
    * null-filled. The never-evolved table (no rename/drop ever) takes
    * the single-scan fast path, plan-identical to before.
    */
  private def readFileSetEvolved(snap: TableSnapshot,
      files: Seq[String], withPos: Boolean = false): DataFrame = {
    val schema = storedSchema(snap.meta)
    val hist = colHistOf(snap.meta)
    if (schema.isEmpty || files.isEmpty || !hasEvolution(hist))
      return readFileSet(files, schema, withPos)
    val s = schema.get
    val ids = colIdsOf(snap.meta)
    def physFor(vf: Long): Seq[Option[String]] = s.fields.toSeq.map { f =>
      ids.get(f.name).flatMap(hist.get) match {
        case None => Some(f.name) // no recorded history: name is stable
        case Some(entries) =>
          val applicable = entries.filter(_._1 <= vf)
          if (applicable.isEmpty) None // the file predates the column
          else applicable.maxBy(_._1)._2
      }
    }
    files.groupBy(f => physFor(fileVersionOf(f).getOrElse(Long.MaxValue)))
      .toSeq.sortBy(_._2.head).map { case (phys, fs) =>
        val physSchema = StructType(s.fields.toSeq.zip(phys).collect {
          case (f, Some(p)) => StructField(p, f.dataType, f.nullable, f.metadata)
        })
        readFileSet(fs, Some(physSchema), withPos).select(
          s.fields.toSeq.zip(phys).map {
            case (f, Some(p)) => col(p).as(f.name)
            case (f, None) => lit(null).cast(f.dataType).as(f.name)
          } ++ (if (withPos) Seq(col(PosCol)) else Nil): _*)
      }.reduce(_ unionByName _)
  }

  /** Whether a snapshot carries rename/drop column-history epochs (the
    * per-epoch physical-name divergence the evolved read resolves).
    */
  private[weblog] def snapshotHasEvolution(snap: TableSnapshot): Boolean =
    hasEvolution(colHistOf(snap.meta))

  /** Per-file PHYSICAL column names for `fields` (current logical
    * schema order): `Some(physName)` = the file stores the column under
    * that name; `None` = the file predates the column (or its physical
    * twin belongs to a dead id) and must read NULL. The native scan
    * groups files by this mapping into schema EPOCHS and gives each
    * epoch its own positionally-aligned parquet read schema — the same
    * resolution [[readFileSetEvolved]] applies through per-epoch scans.
    */
  private[weblog] def epochPhysicalNames(snap: TableSnapshot,
      fields: Seq[StructField]): String => Seq[Option[String]] = {
    val hist = colHistOf(snap.meta)
    if (!hasEvolution(hist)) { _ => fields.map(f => Some(f.name)) }
    else f => physNamesAt(snap, fields,
      fileVersionOf(f).getOrElse(Long.MaxValue))
  }

  /** Physical names of `fields` as of write version `vf` under the
    * snapshot's column history — the per-VERSION resolution behind
    * [[epochPhysicalNames]], also used directly for DELETE files
    * (their name grammar carries no `part-v` version; the manifest's
    * `deleteSeq` IS their write version, and an equality-delete file
    * stores its key columns under that epoch's names).
    */
  private[weblog] def physNamesAt(snap: TableSnapshot,
      fields: Seq[StructField], vf: Long): Seq[Option[String]] = {
    val hist = colHistOf(snap.meta)
    val ids = colIdsOf(snap.meta)
    fields.map { fld =>
      ids.get(fld.name).flatMap(hist.get) match {
        case None => Some(fld.name) // no recorded history: stable
        case Some(entries) =>
          val applicable = entries.filter(_._1 <= vf)
          if (applicable.isEmpty) None // the file predates the column
          else applicable.maxBy(_._1)._2
      }
    }
  }

  /** A data row's WRITE SEQUENCE, recovered from its physical file name
    * (`part-v<version>-…` — stamped at import, immutable thereafter):
    * the per-file scoping that decides which equality-delete files
    * apply to it. Must be computed ON the scan output (input_file_name
    * is empty after an exchange).
    */
  private def fileSeqExpr: Column =
    regexp_extract(input_file_name(), "part-v(\\d+)-", 1).cast("long")

  /** The table root as it appears INSIDE `input_file_name()` output:
    * that function returns the scan file's URI string, which is
    * percent-ENCODED (space → `%20`, `#` → `%23`), while
    * `root.toUri.getPath` is decoded. Matching the decoded prefix
    * against the encoded name extracts "" whenever the root contains
    * an encodable character — and since BOTH the delete-file write side
    * and the scan side key on the extraction, every ("", ordinal)
    * tuple would cross-match across files: silent over-deletion. All
    * path-identity expressions quote THIS raw form instead; for plain
    * ASCII roots it is byte-identical to the decoded path.
    */
  private lazy val rawRootPattern: String =
    java.util.regex.Pattern.quote(new java.net.URI(null, null,
      root.toUri.getPath.stripSuffix("/"), null).getRawPath)

  /** A row's LEAF PARTITION path relative to the table root, from the
    * same physical name — equality deletes are partition-scoped, like
    * Iceberg's.
    */
  private def fileLeafExpr: Column =
    regexp_extract(input_file_name(), s"$rawRootPattern/(.*)/[^/]*$$", 1)

  /** MERGE-ON-READ: remove from `df` (a scan over some subset of the
    * snapshot's DATA files — the helper columns are computed from
    * input_file_name, so it must sit directly on the parquet scan) the
    * rows matched by the snapshot's live equality-delete files. A
    * delete file removes rows that (a) live in the SAME leaf, (b) were
    * written at a sequence strictly below the delete's commit version,
    * and (c) match one of its key tuples null-safely — Iceberg v2
    * equality-delete semantics. Zero cost when the snapshot has no
    * delete files (the common case): the frame is returned untouched.
    *
    * Scale: one broadcast-sized anti-join per delete GENERATION
    * (distinct commit version, bounded by retention and compacted away
    * by [[maintain]]); the delete side is the key tuples only — data
    * rows never shuffle, and the join keys are hashed key columns.
    */
  /** Scan-attached per-file row ordinal (`_metadata.row_index`) — the
    * row half of positional-delete identity. Internal; never stored.
    */
  private val PosCol = "_graft_pos"
  /** Positional-delete file content columns: the data file's path
    * relative to the table root, and the row's ordinal within it. The
    * file carries NO table data — deleting a user's rows positionally
    * leaves nothing of the user in the delete file itself (the GDPR
    * complement to equality deletes, whose tuples ARE the keys).
    */
  private[weblog] val PosDelFile = "_file"
  private[weblog] val PosDelPos = "_pos"

  private def applyDeletes(snap: TableSnapshot, df: DataFrame): DataFrame = {
    val dels = snap.deleteEntries
    if (dels.isEmpty) return df
    val (posDels, eqDels) = dels.partition(e => Manifests.isPosDelete(e.path))
    val seqC = "_graft_fseq"
    val leafC = "_graft_fleaf"
    val base0 = df.withColumn(seqC, fileSeqExpr).withColumn(leafC, fileLeafExpr)
    // POSITIONAL delete files first (Iceberg v2's second delete-file
    // kind): each names (relative data-file path, row ordinal) tuples.
    // File names are immutable and version-unique, so a tuple can never
    // match a rewritten file — no sequence scoping is needed; ONE
    // broadcast anti-join covers every positional generation at once.
    // The input frame must carry the scan-attached row ordinal
    // ([[readFileSet]] withPos) — (file, ordinal) is row identity.
    val base = if (posDels.isEmpty) base0 else {
      require(base0.columns.contains(PosCol),
        "positional delete files are live but the scan did not attach " +
          "row ordinals (internal error: read outside morRead)")
      val fileC = "_graft_frel"
      val pd = spark.read.parquet(posDels.map(e => s"$path/${e.path}"): _*)
        .select(col(PosDelFile).as("_graft_d_file"),
          col(PosDelPos).as("_graft_d_pos"))
      base0
        .withColumn(fileC,
          regexp_extract(input_file_name(), s"$rawRootPattern/(.*)$$", 1))
        .join(broadcast(pd),
          col(fileC) === col("_graft_d_file") &&
            col(PosCol) === col("_graft_d_pos"), "left_anti")
        .drop(fileC)
    }
    if (eqDels.isEmpty) return base.drop(seqC, leafC)
    val folded = eqDels.groupBy(_.deleteSeq).toSeq.sortBy(_._1)
      .foldLeft(base) { case (acc, (dseq, entries)) =>
        // delete files are read WITHOUT basePath: their columns are
        // exactly the equality columns (partition values live only in
        // the path, and the leaf scoping below covers that dimension)
        val delDf = spark.read.parquet(
          entries.map(e => s"$path/${e.path}"): _*)
        val eqCols = delDf.columns.toSeq
        val d = delDf
          .withColumn("_graft_dleaf", fileLeafExpr)
          .select(eqCols.map(c => col(c).as(s"_graft_d_$c")) :+
            col("_graft_dleaf"): _*)
        val cond = eqCols.map(c => acc(c) <=> d(s"_graft_d_$c"))
          .reduce(_ && _) &&
          acc(leafC) === d("_graft_dleaf") &&
          acc(seqC) < lit(dseq)
        acc.join(broadcast(d), cond, "left_anti")
      }
    folded.drop(seqC, leafC)
  }

  /** User-facing read of the live snapshot: the internal bucket column
    * is layout, not schema.
    */
  def read: DataFrame = userFacing(readSnapshot(resolveLive()._2))

  /** The live snapshot as a first-class Catalyst relation backed by
    * [[GraftFileIndex]]: filters applied to the returned DataFrame are
    * pruned by the manifest (partitions), the stamped bounds and the
    * bloom sidecars INSIDE Spark's scan planning, and the surviving
    * scan is the stock vectorized parquet reader — the standard
    * `DataFrame`-native alternative to [[readWhere]]'s explicit API.
    * Requires at least one commit (the schema stamp). The relation is
    * pinned to the snapshot resolved here (snapshot isolation for the
    * DataFrame's lifetime).
    */
  def toDF: DataFrame = {
    val (_, peek) = resolveLive()
    if (hasEvolution(colHistOf(peek.meta))) {
      // the relation's single file index binds columns by name across
      // epochs; a renamed/dropped table reads through the epoch-aware
      // path instead (correctness over the index's zero-listing pruning
      // — maintain() rewrites converge the table back to one epoch)
      return userFacing(readSnapshot(peek))
    }
    val (df, snap) = GraftFileIndex.relationWithSnapshot(spark, this)
    if (needsPos(snap)) {
      // live positional delete files need the scan-attached row ordinal
      // the custom relation does not thread through; read through the
      // standard path until maintain() compacts them away (positional
      // files are transient by design — the threshold consumes them)
      return userFacing(readSnapshot(snap))
    }
    userFacing(applyDeletes(snap, df))
  }

  /** Predicate-pruned read of the live snapshot: file skipping on the
    * manifest-stamped per-file bounds ([[FileStats]]) BEFORE the Spark
    * scan is planned — files whose [min, max] boxes cannot satisfy
    * `condition` never reach the file index, never schedule a task,
    * never open a footer. Equivalent to `read.filter(condition)` row
    * for row (the full condition is still applied to the survivors);
    * the stats only remove provably-empty files. Tables whose manifests
    * predate the stats stamp (or columns outside `statsColumns`) prune
    * nothing and stay correct.
    *
    * At 100 TB this is the point-lookup / time-slice path: a predicate
    * on a stamped column touches the handful of files whose bounds
    * overlap it, not every file of the partition.
    */
  def readWhere(condition: Column): DataFrame = {
    val (_, snap) = resolveLive()
    val schema = storedSchema(snap.meta)
    userFacing(morRead(snap, prunedFiles(snap, schema, condition))
      .filter(condition))
  }

  /** The live files a [[readWhere]] of `condition` would scan — the
    * observable face of stats pruning (specs assert on it; operators
    * can use it to size a lookup).
    */
  def filesFor(condition: Column): Seq[String] = {
    val (_, snap) = resolveLive()
    prunedFiles(snap, storedSchema(snap.meta), condition)
  }

  /** Min/max interval pruning ([[FileStats]]) plus Bloom point-lookup
    * pruning ([[BloomStats]]) of a snapshot's file list. Sidecars load
    * once per call; filters deserialize lazily per (file, col).
    */
  /** Per-file SYNTHESIZED bounds for a transform's source column: the
    * file's partition value (parsed from its immutable leaf path)
    * inverts to the [min, max] source interval — hidden partitioning's
    * pruning, riding the same interval machinery as stamped stats. A
    * stamped bound for the source column (tighter than the inverse
    * image) takes precedence; an unparseable path value adds nothing
    * (absence is always sound).
    *
    * SPEC EVOLUTION: when the snapshot carries a multi-entry spec
    * history ([[SpecHistKey]]) the inverting transform is the one
    * GOVERNING the file — the history entry with the greatest
    * fromVersion <= the file's write version (from its immutable
    * imported name). Inverting an old day-ordinal under a new hourly
    * spec would synthesize bounds ~24× too early and prune files that
    * DO match, so a file whose version cannot be parsed contributes
    * nothing on an evolved table. A single-entry (or absent) history
    * applies the one spec unconditionally — the never-evolved and
    * post-collapse fast path.
    */
  private[weblog] def transformBoundsFn(
      meta: Map[String, String]): String => Map[String, (String, String)] = {
    val hist = specHistOf(meta)
    def invert(t: PartitionTransforms.Transform,
        f: String): Map[String, (String, String)] = {
      val seg = leafOf(f).split('/')
        .find(_.startsWith(s"$partitionCol="))
        .map(_.substring(partitionCol.length + 1))
        // the leaf path is Hive-escaped at write (a Multi composite
        // value carries '%'); unescape before inverting so the parsed
        // legs see the derived rendering, not the path encoding
        .map(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName)
      // per-leg bounds: a Multi spec emits one interval PER SOURCE, so
      // a predicate on any leg prunes independently
      seg.map(t.allBounds).getOrElse(Map.empty)
    }
    if (transform.isEmpty) {
      // PHYSICAL partition column: its leaf-path value is an exact
      // [v, v] bound, so partition predicates prune at the MANIFEST
      // level too (readWhere's pruned planning, maintainWhere's leaf
      // discovery), not just in the scan's partition pruning. Escaped
      // (%XX) and null-partition segments contribute nothing — sound.
      f => {
        val seg = leafOf(f).split('/')
          .find(_.startsWith(s"$partitionCol="))
          .map(_.substring(partitionCol.length + 1))
        seg.filter(v => v != "__HIVE_DEFAULT_PARTITION__" && !v.contains('%'))
          .map(v => Map(partitionCol -> (v, v)))
          .getOrElse(Map.empty)
      }
    } else if (hist.size > 1) { f =>
      fileVersionOf(f)
        .flatMap(v => hist.filter(_._1 <= v).lastOption)
        .map(h => invert(transformOf(h._2), f))
        .getOrElse(Map.empty)
    } else {
      // single-entry / absent history: the one spec applies to every
      // file. Resolve it from the SNAPSHOT (its layout stamp) before
      // the handle — a time-travel read at a pre-evolve snapshot must
      // invert under the spec that snapshot was written with, not the
      // handle's newer one.
      val t = hist.headOption.map(h => transformOf(h._2))
        .orElse(storedTransform(meta)).orElse(transform)
      t.fold((_: String) => Map.empty[String, (String, String)])(
        tt => invert(tt, _))
    }
  }

  /** Per-file MEMBERSHIP oracles synthesized from the partition
    * transform ([[PartitionTransforms.Transform.allMembers]]) — the
    * bucket(n, col) analogue of [[transformBoundsFn]]: a bucket leaf
    * inverts to a hash class, not an interval, so point predicates
    * (`=`, `IN`) decide per file through [[FileStats.mayMatch]]'s
    * Membership hook instead of interval satisfiability. Same
    * per-epoch resolution as the bounds (a file decodes under the
    * spec governing ITS write version); empty maps for interval
    * transforms and physical layouts — absence never prunes.
    */
  private[weblog] def transformMembersFn(meta: Map[String, String])
      : String => Map[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]] = {
    val hist = specHistOf(meta)
    def membersOf(t: PartitionTransforms.Transform,
        f: String): Map[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]] =
      leafOf(f).split('/')
        .find(_.startsWith(s"$partitionCol="))
        .map(_.substring(partitionCol.length + 1))
        .map {
          case org.apache.spark.sql.catalyst.catalog
              .ExternalCatalogUtils.DEFAULT_PARTITION_NAME =>
            // the WHOLE-NULL leaf: for every transform EXCEPT void, a
            // null derived value implies the source itself was NULL in
            // every row, so no non-null point literal can live here.
            // Sound because mayMatch only consults membership for
            // non-null constants (a null literal's constOf is None and
            // keeps the file). void() derives null REGARDLESS of the
            // source — its null leaf holds every row, never prunable.
            t match {
              case _: PartitionTransforms.Void =>
                Map.empty[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]]
              case _ =>
                t.sources.map(s => s ->
                  ((_: Any, _: org.apache.spark.sql.types.DataType) =>
                    Some(false): Option[Boolean])).toMap
            }
          case raw => t.allMembers(
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(raw))
        }.getOrElse(Map.empty)
    if (transform.isEmpty) {
      _ => Map.empty
    } else if (hist.size > 1) { f =>
      fileVersionOf(f)
        .flatMap(v => hist.filter(_._1 <= v).lastOption)
        .map(h => membersOf(transformOf(h._2), f))
        .getOrElse(Map.empty)
    } else {
      val t = hist.headOption.map(h => transformOf(h._2))
        .orElse(storedTransform(meta)).orElse(transform)
      t.fold((_: String) =>
        Map.empty[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]])(
        tt => membersOf(tt, _))
    }
  }

  /** The transform a snapshot's stored layout stamp declares, if any —
    * `pcol=days(ts)/...` → `days(ts)`. None for unstamped (legacy) or
    * untransformed layouts.
    */
  private def storedTransform(
      meta: Map[String, String]): Option[PartitionTransforms.Transform] = {
    val seg = meta.get(LayoutKey).map(_.split('/')(0))
    seg.flatMap { s =>
      val i = s.indexOf('=')
      if (i < 0) None
      else scala.util.Try(transformOf(s.drop(i + 1))).toOption
    }
  }

  /** The partition transform GOVERNING every live data file of a
    * snapshot, when ONE does — the basis of every leaf-exact metadata
    * decision (grouped/handled aggregates, handled filters, whole-leaf
    * DELETE):
    *
    *  - a SINGLE-ENTRY spec history applies its spec unconditionally:
    *    the post-collapse fast path — once maintain() has rewritten
    *    every pre-evolution file, the commit-time collapse drops the
    *    old epochs and an evolved table RE-QUALIFIES for the zero-task
    *    paths (r13; the r12 posture demoted it forever);
    *  - NO history: the snapshot's OWN layout stamp, not the handle's
    *    declared transform — a pinned pre-evolution snapshot read
    *    through an evolved handle must decode its leaves under the
    *    spec they were written with (a days() day-ordinal decoded as
    *    an hours() ordinal would silently answer wrong); the handle's
    *    transform only backstops unstamped legacy snapshots;
    *  - a MULTI-ENTRY history has no single governing spec: None —
    *    per-file epoch resolution ([[transformBoundsFn]]) still prunes,
    *    but leaf-exact row decisions refuse (fallback, never a guess).
    *
    * Inner None = the physical identity layout (no hidden transform).
    */
  private[weblog] def governingTransform(snap: TableSnapshot)
      : Option[Option[PartitionTransforms.Transform]] =
    specHistOf(snap.meta) match {
      case Nil => Some(storedTransform(snap.meta).orElse(transform))
      case Seq((from, s)) =>
        // Defense-in-depth (r14): a one-entry history with fromVersion
        // > 0 encodes the collapse-commit invariant — every live data
        // file was written at-or-past it. Verify instead of trusting
        // (one memoized pass per snapshot): a stray old-named file
        // (re-introduced by any future path that breaks the invariant)
        // would otherwise have its old-epoch leaf decoded under the
        // wrong spec. Violation ⇒ no single governing spec; per-file
        // epoch resolution still prunes.
        if (from > 0L && !snap.minDataFileVersion.exists(_ >= from))
          None
        else
          Some(Some(try transformOf(s) catch {
            case scala.util.control.NonFatal(_) => return None
          }))
      case _ => None
    }

  private def prunedFiles(snap: TableSnapshot,
      schema: Option[StructType], condition: Column): Seq[String] =
    (schema, analyzedPredicate(schema, condition)) match {
      case (Some(s), Some(e)) =>
        val stats = snap.statsOf
        val transformBounds = transformBoundsFn(snap.meta)
        val transformMembers = transformMembersFn(snap.meta)
        val sidecars = bloomSidecarsOf(snap.meta)
        lazy val blooms: BloomStats.Sidecar =
          sidecars.map(n => BloomStats.read(fs, new Path(root, n)))
            .foldLeft(Map.empty: BloomStats.Sidecar)(_ ++ _)
        val filterCache = scala.collection.mutable.Map.empty[(String, String), org.apache.spark.util.sketch.BloomFilter]
        snap.dataFiles.filter { f =>
          val bloomMember: FileStats.Membership =
            if (sidecars.isEmpty) FileStats.NoMembership
            else (colName, value, dt) =>
              blooms.get(f).flatMap(_.get(colName)).map { bytes =>
                filterCache.getOrElseUpdate((f, colName), BloomStats.filterOf(bytes))
                  .mightContainLong(BloomStats.hashOf(value, dt))
              }
          // bucket-transform membership composes with the blooms: a
          // provable absence from EITHER side prunes (both are
          // no-false-negative); otherwise defer to the other oracle
          val tm = transformMembers(f)
          val member: FileStats.Membership =
            if (tm.isEmpty) bloomMember
            else (colName, value, dt) =>
              tm.get(colName).flatMap(fn => fn(value, dt)) match {
                case Some(false) => Some(false)
                case viaTransform =>
                  bloomMember(colName, value, dt).orElse(viaTransform)
              }
          val cols = transformBounds(f) ++ stats.getOrElse(f, Map.empty)
          FileStats.mayMatch(cols, s, e, member)
        }
      case _ => snap.dataFiles
    }

  /** Resolve `condition` against the stamped schema (an empty frame —
    * no I/O) so the attribute references are typed; None when the
    * condition does not analyze (e.g. references a column the table
    * lacks — readWhere then reads everything and lets the real filter
    * raise the error).
    */
  private def analyzedPredicate(schema: Option[StructType],
      condition: Column): Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    schema.flatMap { s =>
      try {
        val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
        empty.filter(condition).queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Predicate-pruned TIME TRAVEL: [[readWhere]] against a retained
    * historical snapshot — the stats/bloom stamps live in each
    * manifest, so file skipping composes with `readAt` for free.
    */
  def readWhereAt(version: Long, condition: Column): DataFrame = {
    val snap = snapshotAt(version)
    userFacing(morRead(snap,
        prunedFiles(snap, storedSchema(snap.meta), condition))
      .filter(condition))
  }

  /** Time travel: read a retained historical snapshot by version. */
  def readAt(version: Long): DataFrame =
    userFacing(readSnapshot(snapshotAt(version)))

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
    val fromSnap = snapshotAt(fromVersion)
    val toSnap = snapshotAt(toVersion)
    // leaf-change detection spans data AND delete files (a merge-on-read
    // delete changes rows without touching a single data file); the
    // reads below open each side's DATA files with its own delete set
    // applied, so the diff compares post-MOR row states
    val changed = changedLeaves(fromSnap.files, toSnap.files)
    val oldFiles = fromSnap.dataFiles.filter(f => changed(leafOf(f)))
    val newFiles = toSnap.dataFiles.filter(f => changed(leafOf(f)))
    val oldDf = if (oldFiles.isEmpty) None
      else Some(morRead(fromSnap, oldFiles).drop(bucketCol))
    val newDf = if (newFiles.isEmpty) None
      else Some(morRead(toSnap, newFiles).drop(bucketCol))

    def tagged(df: DataFrame, tag: String): DataFrame =
      df.select(lit(tag).as("_change_type") +: df.columns.map(col): _*)
        .withColumn("_commit_version", lit(toVersion))

    (oldDf, newDf) match {
      case (None, None) =>
        // no leaf changed at all — an empty, correctly-typed changelog.
        // Typed from the toVersion schema stamp, so this works even when
        // the live manifest holds zero files (a delete() erased all rows)
        val base =
          if (storedSchema(toSnap.meta).isDefined)
            readSnapshot(toSnap.copy(entries = Nil))
          else readSnapshot(toSnap).limit(0) // legacy unstamped manifest
        tagged(base.drop(bucketCol), "insert")
      case (None, Some(n)) => tagged(n, "insert")
      case (Some(o), None) => tagged(o, "delete")
      case (Some(o), Some(n)) =>
        // align schemas across the snapshots (add-column evolution): a
        // column only one side carries reads null on the other. Shared
        // names must agree on type — add-column-only is the contract,
        // and a silent preference would miscompare rather than fail.
        val fields = (o.schema.fields ++ n.schema.fields)
          .groupBy(_.name).view.mapValues { fs =>
            val types = fs.map(f => nullableOf(f.dataType)).distinct
            require(types.size == 1,
              s"column '${fs.head.name}' has diverging types across " +
                s"snapshots v$fromVersion..v$toVersion (${types.mkString(" vs ")}); " +
                "schema evolution is add-column-only")
            fs.head
          }.toMap
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
    val fromSnap = snapshotAt(fromVersion)
    val from = fromSnap.dataFiles.toSet
    val toSnap = snapshotAt(toVersion)
    require(from.subsetOf(toSnap.dataFiles.toSet),
      s"snapshot window v$fromVersion..v$toVersion removed files (a rewrite " +
        "or delete ran); use a keyed table + changesBetween for row-level CDC")
    require(fromSnap.deleteEntries.map(_.path).toSet ==
      toSnap.deleteEntries.map(_.path).toSet,
      s"snapshot window v$fromVersion..v$toVersion changed equality-delete " +
        "files (a merge-on-read delete ran); use changesBetween for row-level CDC")
    val added = toSnap.dataFiles.filterNot(from)
    val base = {
      val df =
        if (added.nonEmpty) readFileSetEvolved(toSnap, added)
        else if (storedSchema(toSnap.meta).isDefined)
          readSnapshot(toSnap.copy(entries = Nil))
        else readSnapshot(toSnap).limit(0) // legacy unstamped manifest
      if (uniqueKeys.isEmpty) df else df.drop(bucketCol)
    }
    base.withColumn("_commit_version", lit(toVersion))
  }

  /** The leaf partitions holding data in a retained snapshot, sorted —
    * the deterministic chunking domain for [[ChangeFeed]]'s bounded
    * initial load (a 100 TB initial mirror must not be one giant
    * window).
    */
  private[graft] def dataLeavesAt(version: Long): Seq[String] =
    snapshotAt(version).dataFiles.map(leafOf).distinct.sorted

  /** Total stamped bytes of a retained snapshot's data files — the
    * admission-control weight of an initial streaming load, resolved
    * from the manifest alone (zero data I/O). Legacy entries without a
    * stamped size (-1, pre-sharded-manifest tables) count as ZERO —
    * they cannot be budgeted without I/O; `maintain()` rewrites stamp
    * them. Callers treating the result as a budget should know a
    * legacy-heavy table under-counts.
    */
  private[graft] def dataBytesAt(version: Long): Long =
    snapshotAt(version).dataEntries.map(e => math.max(0L, e.size)).sum

  /** Stamped bytes of the data files present at `to` but not at
    * `from` — the admission-control weight of a streaming version
    * window (what a change read of (from, to] must scan; an upper
    * bound for keyed tables, whose leaf pruning can only shrink it).
    * Manifest-only: O(entries), zero data I/O. Unstamped legacy sizes
    * count as zero (see [[dataBytesAt]]).
    */
  private[graft] def addedBytesBetween(from: Long, to: Long): Long = {
    val base = snapshotAt(from).dataFiles.toSet
    snapshotAt(to).dataEntries.filterNot(e => base(e.path))
      .map(e => math.max(0L, e.size)).sum
  }

  /** Manifest-resolved statistics of the files a predicate leaves
    * after pruning — (bytes, rows), zero data I/O. This is what feeds
    * Spark's join planning through the relation/scan statistics: a
    * small (or well-pruned) graft table reports its true size and gets
    * auto-broadcast, instead of the V1 default (defaultSizeInBytes =
    * effectively never). Unstamped legacy sizes count as 0; row counts
    * are estimates when delete files are live (they can only shrink
    * the true count — sound for planning).
    */
  private[graft] def scanStatsFor(
      condition: Column): (Option[Long], Option[Long]) = {
    val snap = resolveLive()._2
    val files = prunedFiles(snap, storedSchema(snap.meta), condition).toSet
    val entries = snap.dataEntries.filter(e => files(e.path))
    // UNKNOWN (None), never zero, when any legacy entry lacks a stamp:
    // a "1-byte" claim would auto-broadcast an arbitrarily large table
    val bytes =
      if (entries.forall(_.size >= 0L)) Some(entries.map(_.size).sum)
      else None
    val rows =
      if (entries.forall(_.rowCount >= 0L)) Some(entries.map(_.rowCount).sum)
      else None
    (bytes, rows)
  }

  /** Cheap whole-table byte estimate for relation-level statistics:
    * one map-sum over the live manifest entries, no predicate
    * analysis. None when any entry size is unstamped (legacy).
    */
  private[graft] def dataBytesEstimate: Option[Long] = {
    val entries = resolveLive()._2.dataEntries
    if (entries.forall(_.size >= 0L)) Some(entries.map(_.size).sum) else None
  }

  /** Largest end version in (from, cap] whose ADDED data bytes (vs the
    * `from` snapshot) stay within `budget` — always at least from+1 (an
    * oversized commit must drain, not stall). ONE pass: the base file
    * set resolves once; each candidate snapshot scans once (leaf
    * manifests are JVM-cached), so a 100-version lag costs O(versions)
    * manifest reads per trigger, not O(versions²) set builds.
    */
  private[graft] def byteCappedEnd(from: Long, cap: Long, budget: Long): Long = {
    if (cap <= from + 1) return cap
    val base = snapshotAt(from).dataFiles.toSet
    def addedIn(v: Long): Long = snapshotAt(v).dataEntries
      .filterNot(e => base(e.path)).map(e => math.max(0L, e.size)).sum
    var e = from + 1
    while (e < cap && addedIn(e + 1) <= budget) e += 1
    e
  }

  /** Read a subset of a retained snapshot's leaves (equality deletes
    * applied, layout column hidden) — one bounded chunk of an initial
    * load. Partition pruning applies by construction: only the chunk's
    * files are listed.
    */
  private[graft] def readLeavesAt(version: Long, leaves: Set[String]): DataFrame = {
    val snap = snapshotAt(version)
    val files = snap.dataFiles.filter(f => leaves(leafOf(f)))
    val df = morRead(snap, files)
    if (uniqueKeys.isEmpty) df else df.drop(bucketCol)
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
  def rollbackTo(version: Long): Long = withCommitRetry {
    val target = snapshotAt(version)
    val (liveVersion, live) = resolveLive()
    validateLayout(live.meta)
    val newVersion = nextVersion(liveVersion)
    // roll back to the target's files AND schema (a rollback across an
    // add-column commit restores the pre-evolution schema), plus the
    // target's file stats and bloom sidecar references (they describe
    // the rolled-to files); the append high-water marks are the LIVE
    // ones — the stream's replay cursor is independent of which
    // snapshot the data rolled to.
    val meta = hwmOf(live.meta) ++
      live.meta.get(BranchBaseKey).map(BranchBaseKey -> _) ++
      // constraints are table CONFIG, not data: the live set survives
      // a data rollback (write-time enforcement, so no read breaks)
      live.meta.get(ConstraintsKey).map(ConstraintsKey -> _) ++
      target.meta.get(SchemaKey).map(SchemaKey -> _) ++
      target.meta.get(ColIdsKey).map(ColIdsKey -> _) ++
      target.meta.get(ColHistKey).map(ColHistKey -> _) ++
      target.meta.get(SpecHistKey).map(SpecHistKey -> _) ++
      target.meta.get(IdsFromKey).map(IdsFromKey -> _) ++
      target.meta.get(StatsKey).map(StatsKey -> _) ++
      target.meta.get(BloomKey).map(BloomKey -> _) +
      (TsKey -> System.currentTimeMillis().toString) +
      // the TARGET's layout: a rollback across a partition-spec evolve
      // restores the pre-evolve spec, and the next commit's layout
      // check then insists the handle matches what the data really is
      (LayoutKey -> target.meta.getOrElse(LayoutKey, layoutSpec))
    // sharded targets roll back by RE-REFERENCING their (immutable)
    // leaf manifests; legacy monolithic targets re-list their files
    val lines =
      if (target.refs.nonEmpty) target.refs.map(Manifests.RefMark + _)
      else target.files
    Manifests.write(fs, root, newVersion, lines, meta, chainPrefix)
    expireSnapshots()
    newVersion
  }

  /** The newest retained version whose commit timestamp is at or
    * before `tsMillis` (SQL `TIMESTAMP AS OF` resolution) — one
    * manifest-header read per retained version, newest first, so the
    * common "recent timestamp" probe reads one or two headers.
    */
  def versionAsOf(tsMillis: Long): Option[Long] =
    versions.reverse.find(v =>
      Manifests.snapshotAt(fs, root, v, chainPrefix)
        .flatMap(_.meta.get(TsKey)).flatMap(_.toLongOption)
        .exists(_ <= tsMillis))

  private def snapshotAt(version: Long): TableSnapshot =
    Manifests.snapshotAt(fs, root, version, chainPrefix).map(expand).getOrElse(
      throw new NoSuchElementException(
        s"snapshot v$version not found (expired or never committed) under $path"))

  /** The leaves whose file set (data or delete) differs between two
    * retained snapshots — the only leaves that can contain row changes.
    */
  private def changedLeaves(from: Seq[String], to: Seq[String]): Set[String] = {
    val fromByLeaf = from.groupBy(leafOf).view.mapValues(_.toSet).toMap
    val toByLeaf = to.groupBy(leafOf).view.mapValues(_.toSet).toMap
    (fromByLeaf.keySet ++ toByLeaf.keySet).filter { l =>
      fromByLeaf.getOrElse(l, Set.empty) != toByLeaf.getOrElse(l, Set.empty)
    }
  }

  /** Metadata TABLE (Iceberg's `table.snapshots`): one row per retained
    * snapshot — version, file count, whether the schema stamp / stats /
    * bloom sidecars are present, and the per-stream append high-water
    * marks. Pure manifest reads, no data I/O.
    */
  def snapshots: DataFrame = {
    import spark.implicits._
    versions.flatMap(v =>
      Manifests.snapshotAt(fs, root, v, chainPrefix).map(s => v -> expand(s)))
      .map { case (v, s) =>
        (v, s.entries.size.toLong, s.meta.contains(SchemaKey),
          s.entries.exists(_.stats.nonEmpty) || s.meta.contains(StatsKey),
          bloomSidecarsOf(s.meta).size,
          hwmOf(s.meta).size,
          s.meta.get(TsKey).flatMap(_.toLongOption))
      }
      .toDF("version", "n_files", "has_schema", "has_stats",
        "n_bloom_sidecars", "n_stream_marks", "commit_ts")
  }

  /** Metadata TABLE (Iceberg's `table.files`): one row per live data
    * file — relative path, leaf partition, and whether bounds / bloom
    * entries cover it. Manifest + sidecar reads only; no data file is
    * opened.
    */
  def files: DataFrame = {
    import spark.implicits._
    val (_, snap) = resolveLive()
    val blooms = bloomSidecarsOf(snap.meta)
      .map(n => BloomStats.read(fs, new Path(root, n)))
      .foldLeft(Map.empty: BloomStats.Sidecar)(_ ++ _)
    snap.entries.map { e =>
      val leaf = leafOf(e.path)
      (e.path, leaf, e.size, e.rowCount, e.stats.size,
        blooms.get(e.path).map(_.size).getOrElse(0),
        // r11 stamp coverage: which metadata aggregates this file can
        // serve (null counts → COUNT(col), NDV → CBO, sums → SUM(col))
        e.nulls.size, e.ndv.size, e.sums.size, e.isDelete)
    }.toDF("file", "leaf", "size_bytes", "row_count", "n_stat_cols",
      "n_bloom_cols", "n_null_cols", "n_ndv_cols", "n_sum_cols",
      "is_delete")
  }

  /** Metadata TABLE (Iceberg's `table.partitions`): one row per live
    * leaf partition — leaf path, data-file count, stamped byte/row
    * sums (-1 when any entry predates the stamps), live delete-file
    * count. Manifest reads only; the 100 TB "how big is each
    * partition" question costs zero tasks.
    */
  def partitions: DataFrame = {
    import spark.implicits._
    val (_, snap) = resolveLive()
    snap.entries.groupBy(e => leafOf(e.path)).toSeq.sortBy(_._1)
      .map { case (leaf, es) =>
        val (del, data) = es.partition(_.isDelete)
        (leaf,
          data.size.toLong,
          if (data.forall(_.size >= 0L)) data.map(_.size).sum else -1L,
          if (data.forall(_.rowCount >= 0L)) data.map(_.rowCount).sum else -1L,
          del.size.toLong)
      }
      .toDF("partition", "n_files", "size_bytes", "row_count", "n_delete_files")
  }

  /** Metadata TABLE (Iceberg's `table.history`): one row per retained
    * snapshot of the live chain — version, commit timestamp, parent
    * version (the previous retained version; null for the oldest), and
    * the is-current-ancestor flag. Chains here are LINEAR by
    * construction (rollback commits a NEW version replaying the old
    * one rather than moving a pointer backwards, and branches live
    * under their own chain prefix), so every retained version is an
    * ancestor of the current snapshot — the column is emitted for
    * Iceberg-shape parity and pinned true.
    */
  def history: DataFrame = {
    import spark.implicits._
    val vs = versions
    vs.zip(None +: vs.init.map(Option(_))).map { case (v, parent) =>
      (v,
        Manifests.snapshotAt(fs, root, v, chainPrefix)
          .flatMap(_.meta.get(TsKey)).flatMap(_.toLongOption),
        parent, true)
    }.toDF("version", "commit_ts", "parent_version", "is_current_ancestor")
  }

  /** Metadata TABLE (Iceberg's `table.manifests`): one row per PHYSICAL
    * manifest object behind the live snapshot — the top-level version
    * manifest plus every sharded per-leaf manifest it references, with
    * size, entry census and (for leaf manifests) the one leaf each
    * covers. The operational "how is my metadata laid out" question —
    * at 10⁵ leaves the sharded layout is what keeps commits
    * O(changed leaves) — answered with zero data I/O.
    */
  def manifests: DataFrame = {
    import spark.implicits._
    val (v, snap) = resolveLive()
    val topName = s"$chainPrefix$v"
    def sizeOf(n: String): Long =
      try fs.getFileStatus(new Path(root, n)).getLen
      catch { case scala.util.control.NonFatal(_) => -1L }
    val top = (topName, "top", sizeOf(topName),
      snap.refs.size.toLong, null.asInstanceOf[String])
    val leaves = snap.refs.sorted.map { n =>
      val entries = Manifests.readLeafManifest(fs, root, n)
      (n, "leaf", sizeOf(n), entries.size.toLong,
        entries.headOption.map(e => leafOf(e.path)).orNull)
    }
    (top +: leaves)
      .toDF("manifest", "kind", "size_bytes", "n_entries", "partition")
  }

  /** Metadata TABLE (Iceberg's `table.refs`): every named reference —
    * `main`, branches, tags — with its kind and pinned/current version.
    */
  def namedRefs: DataFrame = {
    import spark.implicits._
    val main = ("main", "BRANCH", currentVersion.getOrElse(0L))
    val branchRows = branches.map(b =>
      (b, "BRANCH", forBranch(b).currentVersion.getOrElse(0L)))
    val tagRows = tags.toSeq.sortBy(_._1).map { case (t, v) => (t, "TAG", v) }
    ((main +: branchRows) ++ tagRows).toDF("name", "type", "version")
  }

  /** Manifest-only `count(*)`: the live row count resolved from the
    * stamped per-file entries alone — zero data I/O, zero tasks. None
    * when any live entry predates the row-count stamp (legacy
    * manifests), in which case callers fall back to a real count.
    */
  def rowCount: Option[Long] = rowCountOf(resolveLive()._2)

  /** Manifest-only `count(*)` for a PINNED retained version — the
    * zero-task time-travel count (`SELECT count(*) ... VERSION AS OF v`,
    * Iceberg's posture; the SQL pushdown already answers it this way,
    * r12). Same refusal rule as [[rowCount]]: None under live delete
    * files or unstamped entries, and callers fall back to a real scan.
    */
  def rowCountAt(version: Long): Option[Long] =
    rowCountOf(snapshotAt(version))

  private def rowCountOf(snap: TableSnapshot): Option[Long] =
    // live equality-delete files make the count undecidable from
    // metadata (how many of their tuples actually hit is a data
    // question) — callers fall back to a real count until maintain()
    // compacts the deletes away
    if (snap.deleteEntries.isEmpty && snap.entries.forall(_.rowCount >= 0L))
      Some(snap.entries.map(_.rowCount).sum)
    else None

  /** The ONE-RESOLUTION facade behind the V2 aggregate pushdown: every
    * probe and fold of one pushed-aggregate computation (the
    * supportCompletePushDown → pushAggregation pair, grouping, distinct
    * counting) reads the SAME resolved snapshot and schema — a commit
    * racing the planner can never pair version-A bounds with version-B
    * comparators inside one answer. `pinned` = a time-travel read: the
    * historical snapshot's own manifests answer (r12 — `SELECT
    * count(*) … VERSION AS OF v` is a zero-task lookup too, Iceberg's
    * posture). None when the snapshot has no stamped schema (the
    * caller scans for real).
    */
  private[graft] def aggView(pinned: Option[Long] = None): Option[AggView] = {
    val snap = pinned match {
      case Some(v) => snapshotAt(v)
      case None => resolveLive()._2
    }
    storedSchema(snap.meta).map(new AggView(snap, _))
  }

  /** Manifest-only MIN/MAX of a stats-stamped column (Iceberg's
    * aggregate pushdown to manifest bounds): exact — per-file [lo, hi]
    * are true bounds of the file's non-null values, so the min of lows
    * / max of highs over live files IS the column min/max — provided
    * EVERY live file carries bounds for the column; a file with no
    * entry (all-null there, legacy manifest, unstamped column) makes
    * the answer undecidable from metadata and returns None. Bounds are
    * returned as their stamped string rendering typed under the column
    * type; zero data I/O, zero tasks.
    */
  def columnMinMax(colName: String): Option[(String, String)] =
    columnMinMaxOf(resolveLive()._2, colName)

  private def columnMinMaxOf(snap: TableSnapshot,
      colName: String): Option[(String, String)] = {
    if (snap.entries.isEmpty) return None
    // a live equality delete may have removed the extreme row: bounds
    // remain valid for PRUNING (over-approximation) but not as an exact
    // min/max answer
    if (snap.deleteEntries.nonEmpty) return None
    val schema = storedSchema(snap.meta).getOrElse(return None)
    val field = schema.fields.find(_.name == colName).getOrElse(return None)
    if (!FileStats.supported(field.dataType)) return None
    val bounds = snap.entries.map(_.stats.get(colName))
    if (bounds.exists(_.isEmpty)) return None
    val typed = bounds.flatten
    val cmp = boundCompare(field.dataType)
    try Some((typed.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
      typed.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Stamped-bound comparison under the column type (the same ordering
    * [[FileStats]] prunes by — unsigned UTF-8 bytes for strings).
    */
  private def boundCompare(dt: DataType): (String, String) => Int = dt match {
    case org.apache.spark.sql.types.StringType => (a, b) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case org.apache.spark.sql.types.FloatType => (a, b) =>
      java.lang.Float.compare(a.toFloat, b.toFloat)
    case org.apache.spark.sql.types.DoubleType => (a, b) =>
      java.lang.Double.compare(a.toDouble, b.toDouble)
    case _: org.apache.spark.sql.types.DecimalType => (a, b) =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => (a, b) => java.lang.Long.compare(a.toLong, b.toLong)
  }

  /** One-snapshot aggregate computations for the V2 pushdown — see
    * [[aggView]]. Whole-table (optionally filter-handled) folds,
    * GENERALIZED grouping (r12): each live leaf decomposes into
    * per-LEG raw values under the partition spec — one leg for
    * identity layouts and single transforms, one per leg of a
    * `multi(days(ts), event, …)` composite — and the caller's key
    * function maps leg values into its grouping expressions' value
    * space. Leaves mapping to the SAME key tuple MERGE (counts/sums
    * add, bounds combine under the column ordering, distinct sets
    * union), so a pushed GROUP BY can never emit duplicate rows, and
    * many-to-one mappings (every Monday, two escapings of one value)
    * collapse correctly. COUNT(DISTINCT <partition dimension>) counts
    * distinct non-null mapped values over leaves that actually hold
    * rows. None anywhere = undecidable — the caller scans for real.
    */
  private[graft] final class AggView private[weblog] (
      snap: TableSnapshot, val schema: StructType) {

    /** Whole-table aggregates over the leaves the HANDLED filters keep:
      * (row count, per-column exact [min,max], non-null counts, exact
      * decimal sums with non-null counts). Works on ANY layout — no
      * leaf decomposition needed. None = undecidable (unstamped row
      * count, undecidable filter, a live delete file whose leaf the
      * filters KEEP); a bound/count/sum missing for one column is
      * simply absent from its map.
      *
      * Live tombstones refuse only when they can mask a CONTRIBUTING
      * row (r13): both delete-file kinds are leaf-scoped, so a delete
      * file whose leaf the handled filters exclude cannot touch the
      * kept leaves' stamped counts — `count(*) WHERE day = 3` on a
      * GDPR table tombstoned in day 5 stays a zero-task lookup.
      */
    def aggregates(minMaxCols: Seq[String], countCols: Seq[String],
        sumCols: Seq[String],
        filters: Seq[org.apache.spark.sql.sources.Filter])
        : Option[(Long, Map[String, (String, String)], Map[String, Long],
          Map[String, (java.math.BigDecimal, Long)])] = {
      // per-FILE decisions (r13): multi-epoch snapshots answer too when
      // each touched file's own spec decides the filters; the
      // kept-leaf tombstone soundness check lives in the fold
      val decide = entryDeciderFor(snap, filters).getOrElse(return None)
      manifestAggregatesByLeaf(minMaxCols, countCols, sumCols, snap, decide)
    }

    /** The spec GOVERNING every live file of THIS snapshot (r13):
      * single-entry histories qualify (the post-collapse path), absent
      * histories resolve the snapshot's own layout stamp — so a pinned
      * pre-evolution snapshot decodes under the spec its leaves were
      * written with, and a collapsed evolved table re-qualifies for
      * zero-task grouped answers. None = multi-epoch: grouping then
      * decodes per FILE epoch with leg alignment (below).
      */
    private val gov: Option[Option[PartitionTransforms.Transform]] =
      governingTransform(snap)

    private val hist: Seq[(Long, String)] = specHistOf(snap.meta)

    /** The CURRENT spec the grouping legs are declared against: the
      * governing one when a single spec governs, the LAST history
      * entry on a multi-epoch snapshot (new files' spec — old epochs
      * align onto it per leg). Outer None = unresolvable.
      */
    private val currentT: Option[Option[PartitionTransforms.Transform]] =
      gov.orElse(hist.lastOption.flatMap(h =>
        try Some(Some(transformOf(h._2))) catch {
          case scala.util.control.NonFatal(_) => None
        }))

    /** The partition spec's LEG descriptors (leaf-decomposition order),
      * or None when leaves cannot be decomposed into groupable values:
      * a multi-epoch spec history (an old epoch's leaf value encodes a
      * DIFFERENT spec), a truncate/void single transform, or a missing
      * schema field for a leg source.
      */
    val legs: Option[Seq[IcebergLikeTable.AggLeg]] = {
      import IcebergLikeTable.AggLeg
      def ofTransform(t: PartitionTransforms.Transform): Option[AggLeg] =
        t match {
          case PartitionTransforms.Days(s) => Some(AggLeg.Time(s, hoursLeg = false))
          case PartitionTransforms.Hours(s) => Some(AggLeg.Time(s, hoursLeg = true))
          case PartitionTransforms.Months(s) =>
            Some(AggLeg.CalTime(s, yearsLeg = false))
          case PartitionTransforms.Years(s) =>
            Some(AggLeg.CalTime(s, yearsLeg = true))
          case PartitionTransforms.Identity(s) =>
            schema.fields.find(_.name == s).map(AggLeg.IdentityData)
          // truncate buckets a RANGE of source values into one leaf,
          // bucket a HASH CLASS — present for index alignment, never
          // groupable (a leaf value inverts to neither a point nor an
          // interval of the source)
          case _: PartitionTransforms.Truncate |
               _: PartitionTransforms.Bucket => Some(AggLeg.Opaque)
          case _ => None
        }
      currentT match {
        case None => None // unresolvable spec
        case Some(None) =>
          schema.fields.find(_.name == partitionCol)
            .map(f => Seq(AggLeg.IdentityPhys(f): AggLeg))
        case Some(Some(m: PartitionTransforms.Multi)) =>
          val ls = m.legs.map(ofTransform)
          if (ls.exists(_.isEmpty)) None else Some(ls.flatten)
        case Some(Some(t)) => ofTransform(t).map(Seq(_))
      }
    }

    /** The current legs' TRANSFORMS, for multi-epoch alignment; None
      * for the physical-identity layout (which can never be
      * multi-epoch — spec histories only exist on hidden transforms).
      */
    private val legTransforms: Option[Seq[PartitionTransforms.Transform]] =
      currentT.flatten.map {
        case m: PartitionTransforms.Multi => m.legs
        case t => Seq(t)
      }

    /** Per-leg raw values of one leaf (inner None = the null leg value),
      * or None when the leaf does not parse under the spec — a foreign
      * directory layout brought in by importFiles.
      */
    private def legValues(leaf: String, nLegs: Int): Option[Seq[Option[String]]] = {
      val raw = leaf.split('/')
        .find(_.startsWith(s"$partitionCol="))
        .map(_.substring(partitionCol.length + 1))
        .getOrElse(return None)
      if (raw == org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
        return Some(Seq.fill(nLegs)(None))
      val value = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.unescapePathName(raw)
      currentT match {
        case Some(Some(m: PartitionTransforms.Multi)) =>
          multiLegValues(m, value)
        case _ => Some(Seq(Some(value)))
      }
    }

    /** GROUPED aggregates keyed by `keyOf` over the per-leg leaf values:
      * one row per distinct key tuple — (key, row count, per-column
      * [min,max], non-null counts, (sum, non-null) pairs, per-spec
      * distinct counts). `distinctOf` entries each map leg values to a
      * COUNT(DISTINCT)-counted value (null = excluded, SQL semantics);
      * only leaves that actually hold rows contribute (a zero-row
      * leaf's value never occurs in the data). A throwing `keyOf` /
      * `distinctOf` (unparseable leaf value) refuses — fallback, never
      * a guess. Handled filters drop whole leaves BEFORE grouping —
      * exactly Aggregate(Filter(scan)) order.
      */
    /** Occurrence-ranked leg keys of a transform list: leg i renders as
      * (spec string, occurrence rank), so two legs with identical specs
      * (degenerate but legal) still align positionally across epochs.
      */
    private def legOccurrences(ts: Seq[PartitionTransforms.Transform])
        : Seq[(String, Int)] = {
      val seen = scala.collection.mutable.Map.empty[String, Int]
      ts.map { t =>
        val r = seen.getOrElse(t.spec, 0); seen(t.spec) = r + 1; (t.spec, r)
      }
    }

    def grouped(filters: Seq[org.apache.spark.sql.sources.Filter],
        keyOf: Seq[Option[String]] => Seq[Any],
        minMaxCols: Seq[String], countCols: Seq[String], sumCols: Seq[String],
        distinctOf: Seq[Seq[Option[String]] => Any],
        usedLegs: Set[Int])
        : Option[Seq[(Seq[Any], Long, Map[String, (String, String)],
          Map[String, Long], Map[String, (java.math.BigDecimal, Long)],
          Seq[Long])]] = {
      val legsSeq = legs.getOrElse(return None)
      val cmps = minMaxCols.distinct.map { c =>
        val f = schema.fields.find(_.name == c).getOrElse(return None)
        if (!FileStats.supported(f.dataType)) return None
        c -> boundCompare(f.dataType)
      }
      // per-FILE decisions (r13): multi-epoch snapshots keep/drop each
      // file under its OWN epoch's spec
      val decide = entryDeciderFor(snap, filters).getOrElse(return None)
      val matching = snap.dataEntries.filter { e =>
        decide(e) match {
          case Some(keep) => keep
          case None => return None
        }
      }
      // live tombstones refuse only when a KEPT leaf carries one (r13)
      // — leaf-scoping makes excluded leaves' masks irrelevant to the
      // surviving groups' stamped counts/bounds/sums
      if (snap.deleteEntries.nonEmpty) {
        val keptLeaves = matching.map(e => leafOf(e.path)).toSet
        if (snap.deleteEntries.exists(e => keptLeaves.contains(leafOf(e.path))))
          return None
      }
      // per-file CURRENT-leg values. Single-epoch: decode under the one
      // governing spec. Multi-epoch (r13): decode each file's leaf
      // under ITS epoch's spec, then align the epoch's legs onto the
      // current legs by (spec string, occurrence) — a current leg the
      // epoch lacks is acceptable only while the computation never
      // consumes it (`usedLegs`), so `GROUP BY day` answers from
      // metadata DURING a days→multi(days, event) migration while
      // `GROUP BY event` (underivable for old files) falls back.
      val valuesOf: Manifests.FileEntry => Option[Seq[Option[String]]] =
        if (gov.isDefined) { e => legValues(leafOf(e.path), legsSeq.size) }
        else {
          val curT = legTransforms.getOrElse(return None)
          val curOcc = legOccurrences(curT)
          // per-epoch: the epoch's transform + current-leg → epoch-leg
          // index map (-1 = unused placeholder); None = files of this
          // epoch refuse (unparseable spec, or a USED leg is missing)
          val alignments: Seq[Option[(PartitionTransforms.Transform, Array[Int])]] =
            hist.map { case (_, s) =>
              (try Some(transformOf(s)) catch {
                case scala.util.control.NonFatal(_) => None
              }).flatMap { t =>
                val epochLegs = t match {
                  case m: PartitionTransforms.Multi => m.legs
                  case x => Seq(x)
                }
                val occIdx = legOccurrences(epochLegs).zipWithIndex.toMap
                val arr = new Array[Int](curOcc.size)
                var ok = true
                curOcc.zipWithIndex.foreach { case (key, i) =>
                  occIdx.get(key) match {
                    case Some(j) => arr(i) = j
                    case None =>
                      if (usedLegs.contains(i)) ok = false else arr(i) = -1
                  }
                }
                if (ok) Some((t, arr)) else None
              }
            }
          e => {
            val leaf = leafOf(e.path)
            leaf.split('/').find(_.startsWith(s"$partitionCol="))
              .map(_.substring(partitionCol.length + 1)).flatMap {
                case org.apache.spark.sql.catalyst.catalog
                    .ExternalCatalogUtils.DEFAULT_PARTITION_NAME =>
                  // the whole-null leaf proves only that the FILE's
                  // epoch's own legs are NULL — it says nothing about a
                  // current leg the epoch lacks (e.g. an identity leg
                  // added by a later spec; those rows' values are real,
                  // just unrecorded). Resolve the file's epoch and go
                  // through the same alignment as named leaves: the
                  // epoch's legs are all-None, and a USED current leg
                  // missing from the epoch refuses (alignments(k) is
                  // None) instead of silently answering NULL.
                  for {
                    v <- fileVersionOf(e.path)
                    k = hist.lastIndexWhere(_._1 <= v)
                    if k >= 0
                    (_, arr) <- alignments(k)
                  } yield arr.toSeq.map(_ => None: Option[String])
                case raw =>
                  val value = org.apache.spark.sql.catalyst.catalog
                    .ExternalCatalogUtils.unescapePathName(raw)
                  for {
                    v <- fileVersionOf(e.path)
                    k = hist.lastIndexWhere(_._1 <= v)
                    if k >= 0
                    (t, arr) <- alignments(k)
                    epochVals <- t match {
                      case m: PartitionTransforms.Multi =>
                        multiLegValues(m, value)
                      case _ => Some(Seq(Some(value)))
                    }
                  } yield arr.toSeq.map(j =>
                    if (j < 0) None else epochVals(j))
              }
          }
        }
      val valued: Seq[(Seq[Option[String]], Manifests.FileEntry)] =
        matching.map(e => (valuesOf(e).getOrElse(return None), e))
      val keyed =
        try valued.map { case (lv, e) => (keyOf(lv), lv, e) }
        catch { case scala.util.control.NonFatal(_) => return None }
      Some(keyed.groupBy(_._1).toSeq.map { case (k, files) =>
        val es = files.map(_._3)
        if (es.exists(_.rowCount < 0L)) return None
        val bounds = cmps.map { case (c, cmp) =>
          val bs = es.map(_.stats.get(c))
          if (bs.exists(_.isEmpty)) return None
          val typed = bs.flatten
          try c -> ((
            typed.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
            typed.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b)))
          catch { case scala.util.control.NonFatal(_) => return None }
        }.toMap
        // per-group COUNT(col): rows − stamped nulls, exact; an
        // unstamped null count anywhere refuses (fallback)
        val counts = countCols.distinct.map { c =>
          if (es.exists(e => !e.nulls.contains(c))) return None
          c -> es.map(e => e.rowCount - e.nulls(c)).sum
        }.toMap
        // per-group SUM(col): exact decimal fold of the sum stamps
        val sums = sumCols.distinct.map { c =>
          if (es.exists(e => !e.nulls.contains(c) || !e.sums.contains(c)))
            return None
          try c -> ((es.foldLeft(java.math.BigDecimal.ZERO)(
              (a, e) => a.add(new java.math.BigDecimal(e.sums(c)))),
            es.map(e => e.rowCount - e.nulls(c)).sum))
          catch { case scala.util.control.NonFatal(_) => return None }
        }.toMap
        val dvals = distinctOf.map { fn =>
          try files.filter(_._3.rowCount > 0L)
            .map(f => fn(f._2)).filter(_ != null).distinct.size.toLong
          catch { case scala.util.control.NonFatal(_) => return None }
        }
        (k, es.map(_.rowCount).sum, bounds, counts, sums, dvals)
      }.sortBy(_._1.map(String.valueOf).mkString("\u0000")))
    }
  }

  /** Manifest-only COUNT for a PARTITION-COLUMN predicate: every row of
    * a leaf shares its partition values, so a condition that evaluates
    * decidably against leaf values alone sums the matching leaves'
    * stamped row counts — zero data I/O. None when the condition
    * references non-partition columns, fails to analyze/evaluate on any
    * leaf, or any matching leaf predates the row-count stamp (callers
    * fall back to `readWhere(condition).count()`).
    */
  def rowCountWhere(condition: Column): Option[Long] =
    manifestAggregatesWhere(Nil, condition).map(_._1)

  /** The condition bound against the PARTITION columns' schema, when it
    * is decidable there: analyzed, and every referenced attribute is a
    * partition column. The foundation of exact leaf-level decisions —
    * every row of a leaf shares its partition values, so a predicate on
    * them alone evaluates identically for the leaf and for each row.
    */
  private def partitionPredicate(snap: TableSnapshot, condition: Column)
      : Option[(StructType, org.apache.spark.sql.catalyst.expressions.Expression)] = {
    val schema = storedSchema(snap.meta).getOrElse(return None)
    val partSchema = StructType(partCols.flatMap(c => schema.fields.find(_.name == c)))
    if (partSchema.size != partCols.size) return None
    val expr = analyzedPredicate(Some(partSchema), condition).getOrElse(return None)
    val refs = expr.collect {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
    }
    if (!refs.forall(partCols.contains)) return None
    Some((partSchema, expr))
  }

  /** Whether `expr` holds for every row of `leaf`: Some(true/false) when
    * the leaf's values parse under the partition schema (NULL keeps no
    * rows — SQL filter semantics), None when the leaf is undecidable
    * (foreign layout, unsupported type, evaluation error).
    */
  private def leafSatisfies(leaf: String, partSchema: StructType,
      expr: org.apache.spark.sql.catalyst.expressions.Expression): Option[Boolean] = {
    val values = leafPartitionValues(leaf, partSchema).getOrElse(return None)
    val res = try {
      expr.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          val i = partSchema.fieldIndex(a.name)
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, partSchema.fields(i).dataType, nullable = true)
      }.eval(values)
    } catch { case scala.util.control.NonFatal(_) => return None }
    res match {
      case true => Some(true)
      case false | null => Some(false)
      case _ => None
    }
  }

  /** Manifest-only (count, min/max bounds) over the leaves a
    * PARTITION-COLUMN predicate keeps — the filtered twin of
    * [[manifestAggregates]] behind `SELECT count(*) … WHERE day = 3`
    * as a zero-task lookup. None when the condition references
    * non-partition columns, any leaf is undecidable, a KEPT leaf
    * carries a live delete file (r13: non-intersecting tombstones
    * compose — only a tombstone on a leaf the predicate keeps
    * refuses), or a matching leaf predates the row-count stamp. A bound
    * missing for a requested column is simply absent from the map (the
    * caller falls back for that aggregate).
    */
  private[graft] def manifestAggregatesWhere(minMaxCols: Seq[String],
      condition: Column): Option[(Long, Map[String, (String, String)])] = {
    val (_, snap) = resolveLive()
    // primary route (r13): the same conjunct translation + whole-leaf
    // decider the V2 pushdown and the metadata DELETE use — identity
    // layouts AND hidden days()/hours()/truncate()/multi() transforms
    // answer (`rowCountWhere(ts-day-slice)` on a days table is a
    // zero-task lookup). Fallback: the direct partition-column
    // expression evaluation, which admits predicate shapes the V1
    // filter grammar cannot carry (e.g. `day % 2 = 0`). Either way,
    // live tombstones refuse only when a KEPT leaf carries one
    // (checked inside the fold) — leaf-scoping makes excluded leaves'
    // masks irrelevant.
    val viaDecider = for {
      schema <- storedSchema(snap.meta)
      fs <- conditionToFilters(schema, condition)
      decide <- entryDeciderFor(snap, fs)
      res <- manifestAggregatesByLeaf(minMaxCols, Nil, Nil, snap, decide)
    } yield (res._1, res._2)
    viaDecider.orElse {
      partitionPredicate(snap, condition).flatMap { case (partSchema, expr) =>
        manifestAggregatesByLeaf(minMaxCols, Nil, Nil, snap,
          e => leafSatisfies(leafOf(e.path), partSchema, expr))
          .map(r => (r._1, r._2))
      }
    }
  }

  /** `condition`'s top-level conjuncts translated to the V1 filter
    * grammar the whole-leaf decider consumes; None when the condition
    * does not analyze against `schema` or any conjunct fails to
    * translate (refusal — the caller falls back).
    */
  private def conditionToFilters(schema: StructType, condition: Column)
      : Option[Seq[org.apache.spark.sql.sources.Filter]] = {
    val expr = analyzedPredicate(Some(schema), condition).getOrElse(return None)
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val translated = conjuncts(expr).map(
      org.apache.spark.sql.graftbridge.CatalystFilterBridge.translate)
    if (translated.exists(_.isEmpty)) None else Some(translated.flatten)
  }

  private def manifestAggregatesByLeaf(minMaxCols: Seq[String],
      countCols: Seq[String], sumCols: Seq[String],
      snap: TableSnapshot, decide: Manifests.FileEntry => Option[Boolean])
      : Option[(Long, Map[String, (String, String)], Map[String, Long],
        Map[String, (java.math.BigDecimal, Long)])] = {
    val schema = storedSchema(snap.meta).getOrElse(return None)
    // an unsupported/unstamped column is simply absent from the bounds
    // map — same posture as [[manifestAggregates]], the caller falls
    // back for that aggregate
    val cmps = minMaxCols.distinct.flatMap { c =>
      schema.fields.find(_.name == c)
        .filter(f => FileStats.supported(f.dataType))
        .map(f => c -> boundCompare(f.dataType))
    }
    var total = 0L
    val kept = Seq.newBuilder[Manifests.FileEntry]
    // DATA entries only, decided per FILE (r13: on a multi-epoch
    // snapshot two files in one leaf directory can answer differently)
    snap.dataEntries.foreach { e =>
      decide(e) match {
        case None => return None
        case Some(false) => // the file is out — count 0 from it
        case Some(true) =>
          if (e.rowCount < 0L) return None
          total += e.rowCount
          kept += e
      }
    }
    val matching = kept.result()
    // live-tombstone soundness (r13, centralized): a tombstone sharing
    // a leaf with any KEPT file may mask kept rows — the stamped
    // counts/bounds/sums would lie. Tombstones whose leaf holds only
    // excluded (or no) data files mask nothing that contributes.
    if (snap.deleteEntries.nonEmpty) {
      val keptLeaves = matching.map(e => leafOf(e.path)).toSet
      if (snap.deleteEntries.exists(e => keptLeaves.contains(leafOf(e.path))))
        return None
    }
    val bounds = cmps.flatMap { case (c, cmp) =>
      val bs = matching.map(_.stats.get(c))
      if (matching.isEmpty || bs.exists(_.isEmpty)) None
      else {
        val typed = bs.flatten
        try Some(c -> ((
          typed.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
          typed.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b))))
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }.toMap
    // COUNT(col) over the kept leaves: rows − nulls per file, exact;
    // an unstamped null count anywhere drops the column (fallback)
    val counts = countCols.distinct.flatMap { c =>
      if (matching.exists(e => !e.nulls.contains(c))) None
      else Some(c -> matching.map(e => e.rowCount - e.nulls(c)).sum)
    }.toMap
    // SUM(col): exact decimal fold of the kept files' sum stamps
    val sums = sumCols.distinct.flatMap { c =>
      if (matching.exists(e => !e.nulls.contains(c) || !e.sums.contains(c)))
        None
      else try Some(c -> ((
        matching.foldLeft(java.math.BigDecimal.ZERO)(
          (a, e) => a.add(new java.math.BigDecimal(e.sums(c)))),
        matching.map(e => e.rowCount - e.nulls(c)).sum)))
      catch { case scala.util.control.NonFatal(_) => None }
    }.toMap
    Some((total, bounds, counts, sums))
  }

  /** A whole-leaf decision function for HANDLED filters: the returned
    * function answers whether EVERY row of a leaf satisfies them
    * (Some(true/false)) or the leaf is undecidable (None). The outer
    * None = this layout/filter combination cannot be decided
    * leaf-exactly at all. Identity layouts evaluate the predicate
    * against the leaf's typed partition values; days() layouts test
    * day-aligned half-lines against the leaf's day ordinal.
    */
  private def leafDeciderFor(snap: TableSnapshot,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[String => Option[Boolean]] = {
    if (filters.isEmpty) return Some(_ => Some(true))
    // decisions run under the spec GOVERNING the snapshot's files (r13):
    // single-entry histories qualify (post-collapse re-qualification),
    // absent histories resolve the snapshot's own layout stamp (pinned
    // pre-evolution reads decode under THEIR spec); multi-epoch
    // snapshots decide per FILE instead ([[entryDeciderFor]])
    governingTransform(snap) match {
      case None => None // multi-epoch: no single leaf decider exists
      case Some(None) =>
        val conds = filters.flatMap(f =>
          graft.sources.GraftFilterBridge.toColumn(f, exact = true))
        if (conds.size != filters.size) return None
        partitionPredicate(snap, conds.reduce(_ && _)).map {
          case (partSchema, expr) => leafSatisfies(_, partSchema, expr)
        }
      case Some(Some(t)) => transformDeciderFor(t, filters)
    }
  }

  /** The whole-leaf decider of the HANDLED filters under ONE hidden
    * transform — the per-spec core [[leafDeciderFor]] resolves for a
    * single-epoch snapshot and [[entryDeciderFor]] resolves per file
    * epoch on an evolved one.
    */
  private def transformDeciderFor(t: PartitionTransforms.Transform,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[String => Option[Boolean]] = t match {
    // multi(...) specs (r12): each filter translates against exactly
    // ONE leg — boundary-aligned half-lines on a time/truncate leg,
    // exact value predicates on an identity leg — and evaluates
    // against the leaf's decomposed leg values, so `WHERE event =
    // 'view'` / the day-aligned time slice are HANDLED on Iceberg's
    // everyday layout too
    case m: PartitionTransforms.Multi =>
      val preds = filters.map(multiLegTranslate(m))
      if (preds.exists(_.isEmpty)) return None
      val ps = preds.flatten
      Some { leaf =>
        leaf.split('/').find(_.startsWith(s"$partitionCol="))
          .map(_.substring(partitionCol.length + 1)) match {
          case None => None // a leaf without the partition segment
          case Some(raw)
              if raw == org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.DEFAULT_PARTITION_NAME =>
            // the whole-null leaf: every leg value is NULL
            val nulls = Seq.fill[Option[String]](m.legs.size)(None)
            ps.foldLeft(Option(true)) { (acc, p) =>
              acc.flatMap(a => p._2(nulls(p._1)).map(a && _))
            }
          case Some(raw) =>
            multiLegValues(m, org.apache.spark.sql.catalyst.catalog
              .ExternalCatalogUtils.unescapePathName(raw)) match {
              case None => None // foreign value: not this spec's
              case Some(lv) =>
                ps.foldLeft(Option(true)) { (acc, p) =>
                  acc.flatMap(a => p._2(lv(p._1)).map(a && _))
                }
            }
        }
      }
    case t => leafExactTranslateOf(t) match {
      case Some(translate) =>
        val preds = filters.map(translate)
        if (preds.exists(_.isEmpty)) None
        else {
          val ps = preds.flatten.flatten
          Some { leaf =>
            leaf.split('/').find(_.startsWith(s"$partitionCol="))
              .map(_.substring(partitionCol.length + 1)) match {
              case None => None // a leaf without the partition segment
              case Some(raw)
                  if raw == org.apache.spark.sql.catalyst.catalog
                    .ExternalCatalogUtils.DEFAULT_PARTITION_NAME =>
                Some(ps.forall(_.holds(None)))
              case Some(raw) => raw.toLongOption match {
                case None => None // foreign value: not an ordinal
                case Some(d) => Some(ps.forall(_.holds(Some(d))))
              }
            }
          }
        }
      case _ => None
    }
  }

  /** Per-FILE whole-file decision for the HANDLED filters — the
    * multi-epoch generalization of [[leafDeciderFor]] (r13): on an
    * evolved table each live file's leaf decides under the spec
    * GOVERNING that file (the history entry with the greatest
    * fromVersion <= the file's write version), so a day-aligned
    * retention slice decides BOTH the old day-ordinal leaves and the
    * new multi/hour leaves exactly, while both epochs are still live.
    * A file returns None (undecidable) when its version cannot be
    * parsed, its epoch's spec fails to translate the filters, or its
    * leaf does not parse — callers refuse on the files they actually
    * touch, so a dead epoch's untranslatable spec costs nothing.
    * Single-epoch snapshots delegate to the leaf decider.
    */
  private[weblog] def entryDeciderFor(snap: TableSnapshot,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[Manifests.FileEntry => Option[Boolean]] =
    governingTransform(snap) match {
      case Some(_) =>
        leafDeciderFor(snap, filters)
          .map(d => (e: Manifests.FileEntry) => d(leafOf(e.path)))
      case None =>
        if (filters.isEmpty) return Some(_ => Some(true))
        val hist = specHistOf(snap.meta)
        // one decider per history epoch, resolved lazily per file: an
        // epoch whose spec cannot decide the filters only refuses the
        // files it actually governs
        val deciders: Seq[Option[String => Option[Boolean]]] =
          hist.map { case (_, s) =>
            (try Some(transformOf(s)) catch {
              case scala.util.control.NonFatal(_) => None
            }).flatMap(t => transformDeciderFor(t, filters))
          }
        Some { e =>
          fileVersionOf(e.path) match {
            case None => None // foreign name: epoch unknowable
            case Some(v) =>
              val k = hist.lastIndexWhere(_._1 <= v)
              if (k < 0) None
              else deciders(k).flatMap(d => d(leafOf(e.path)))
          }
        }
    }

  /** Per-leg raw values of one multi(...) composite value (already
    * PATH-unescaped): split on the composite separator, each identity
    * leg unescaping its own INTERNAL rendering — the two layers compose
    * injectively. Inner None = the null leg; outer None = a part-count
    * mismatch (the value was not written by this spec).
    */
  private def multiLegValues(m: PartitionTransforms.Multi,
      value: String): Option[Seq[Option[String]]] = {
    val parts = value.split(
      java.util.regex.Pattern.quote(PartitionTransforms.Multi.Sep), -1)
    if (parts.length != m.legs.size) None
    else Some(m.legs.zip(parts.toSeq).map {
      case (_, PartitionTransforms.Multi.NullToken) => None
      case (_: PartitionTransforms.Identity, p) =>
        Some(PartitionTransforms.Multi.unescape(p))
      case (_, p) => Some(p)
    })
  }

  /** Translate one pushed filter against exactly ONE leg of a
    * multi(...) spec: (leg index, predicate over the leg's raw value —
    * Some(keep)/None = undecidable leg value). Time/truncate legs ride
    * [[DaysExactFilter]] (boundary-aligned half-lines over the leg
    * ordinal); identity legs admit exact value predicates
    * (=, <=>, IN, IS [NOT] NULL, and NOT/AND/OR over those) under SQL
    * three-valued semantics, for literal types whose string rendering
    * round-trips the leg encoding (strings, integrals, booleans).
    * Legs use distinct source columns, so at most one leg translates a
    * filter; None = not handleable (the filter stays residual).
    */
  private def multiLegTranslate(m: PartitionTransforms.Multi)(
      f: org.apache.spark.sql.sources.Filter)
      : Option[(Int, Option[String] => Option[Boolean])] = {
    def ordinal(preds: Seq[DaysExactFilter.Pred])
        : Option[String] => Option[Boolean] = {
      case None => Some(preds.forall(_.holds(None)))
      case Some(v) => v.toLongOption match {
        case None => None // foreign value: not an ordinal
        case Some(o) => Some(preds.forall(_.holds(Some(o))))
      }
    }
    m.legs.zipWithIndex.flatMap {
      case (PartitionTransforms.Days(s), i) =>
        DaysExactFilter.of(f, s, PartitionTransforms.MicrosPerDay)
          .map(ps => (i, ordinal(ps)))
      case (PartitionTransforms.Hours(s), i) =>
        DaysExactFilter.of(f, s, PartitionTransforms.MicrosPerHour)
          .map(ps => (i, ordinal(ps)))
      case (PartitionTransforms.Months(s), i) =>
        DaysExactFilter.ofCalendar(f, s, yearsUnit = false)
          .map(ps => (i, ordinal(ps)))
      case (PartitionTransforms.Years(s), i) =>
        DaysExactFilter.ofCalendar(f, s, yearsUnit = true)
          .map(ps => (i, ordinal(ps)))
      case (PartitionTransforms.Truncate(s, w), i) =>
        DaysExactFilter.ofTruncate(f, s, w).map(ps => (i, ordinal(ps)))
      case (PartitionTransforms.Identity(s), i) =>
        IcebergLikeTable.identityLegPredicate(f, s).map(p =>
          (i, (lv: Option[String]) => Some(p(lv).getOrElse(false))))
      case _ => None
    }.headOption
  }

  /** The filter translator of a leaf-exact HIDDEN transform: days and
    * hours (aligned time boundaries against the UTC ordinal leaf
    * value) and truncate (width-aligned integral boundaries against
    * the truncated leaf value). The value-level translation guards the
    * types itself: a literal of the wrong kind simply never
    * translates, so no schema cross-check is needed here.
    */
  private def leafExactTranslateOf(t: PartitionTransforms.Transform):
      Option[org.apache.spark.sql.sources.Filter => Option[Seq[DaysExactFilter.Pred]]] =
    t match {
      case PartitionTransforms.Days(s) =>
        Some((f: org.apache.spark.sql.sources.Filter) =>
          DaysExactFilter.of(f, s, PartitionTransforms.MicrosPerDay))
      case PartitionTransforms.Hours(s) =>
        Some((f: org.apache.spark.sql.sources.Filter) =>
          DaysExactFilter.of(f, s, PartitionTransforms.MicrosPerHour))
      case PartitionTransforms.Months(s) =>
        Some((f: org.apache.spark.sql.sources.Filter) =>
          DaysExactFilter.ofCalendar(f, s, yearsUnit = false))
      case PartitionTransforms.Years(s) =>
        Some((f: org.apache.spark.sql.sources.Filter) =>
          DaysExactFilter.ofCalendar(f, s, yearsUnit = true))
      case PartitionTransforms.Truncate(s, w) =>
        Some((f: org.apache.spark.sql.sources.Filter) =>
          DaysExactFilter.ofTruncate(f, s, w))
      case _ => None
    }

  /** Whether a pushed filter can be declared HANDLED on this table
    * (the scan then honors it row-for-row via whole-leaf decisions and
    * Spark does not re-apply it): identity partition columns of
    * leaf-parseable types, or boundary-aligned half-lines on a
    * days()/hours()/truncate() transform's source.
    */
  private[graft] def exactFilterProbe: org.apache.spark.sql.sources.Filter => Boolean =
    exactFilterProbeAt(None)

  /** [[exactFilterProbe]] against a PINNED snapshot: a time-travel
    * scan's handled-filter promise must be probed under the spec
    * governing THAT snapshot's files (r13) — probing the live spec
    * could declare an hour-aligned filter handled and then find the
    * pinned snapshot's day-ordinal leaves undecidable at planning.
    */
  private[graft] def exactFilterProbeAt(pinned: Option[Long])
      : org.apache.spark.sql.sources.Filter => Boolean = {
    // the probe resolves the SAME snapshot's governing spec the leaf
    // decider will (r13) — probe and decision can never disagree, and
    // a collapsed evolved table re-qualifies here too
    val snap = pinned match {
      case Some(v) => snapshotAt(v)
      case None => resolveLive()._2
    }
    governingTransform(snap) match {
      case None =>
        // multi-epoch history (r13): a filter is handled iff every
        // LIVE epoch's spec translates it — the per-file decider then
        // decides each file under its own spec. Any live file whose
        // epoch is unknowable (foreign name) disqualifies everything.
        val hist = specHistOf(snap.meta)
        val liveEpochs: Option[Set[Int]] = {
          val ks = snap.dataEntries.map(e =>
            fileVersionOf(e.path).map(v => hist.lastIndexWhere(_._1 <= v)))
          if (ks.exists(k => k.isEmpty || k.contains(-1))) None
          else Some(ks.flatten.toSet)
        }
        liveEpochs match {
          case None => _ => false
          case Some(ks) =>
            val ts = ks.toSeq.map(k =>
              try Some(transformOf(hist(k)._2)) catch {
                case scala.util.control.NonFatal(_) => None
              })
            if (ts.exists(_.isEmpty)) _ => false
            else {
              val specs = ts.flatten
              f => specs.forall(t => transformDeciderFor(t, Seq(f)).isDefined)
            }
        }
      case Some(None) =>
        exactPartitionFilterColumns match {
          case Some(cols) => f =>
            f.references.nonEmpty && f.references.forall(cols.contains) &&
              graft.sources.GraftFilterBridge.toColumn(f, exact = true).isDefined
          case None => _ => false
        }
      // multi(...) specs handle per-leg filters (r12): the same
      // translation the leaf decider evaluates
      case Some(Some(m: PartitionTransforms.Multi)) =>
        f => multiLegTranslate(m)(f).isDefined
      case Some(Some(t)) => leafExactTranslateOf(t) match {
        case Some(translate) => f => translate(f).isDefined
        case None => _ => false
      }
    }
  }

  /** Restrict entries to the leaves the HANDLED filters keep — a
    * ROW-exact decision (see [[leafDeciderFor]]), which is what lets
    * the native scan skip Spark's re-application. Undecidable THROWS:
    * the pushdown already promised exact filtering, so a silent
    * superset would surface wrong rows.
    */
  private[weblog] def exactEntriesKeeper(snap: TableSnapshot,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Seq[Manifests.FileEntry] => Seq[Manifests.FileEntry] = {
    val decide = entryDeciderFor(snap, filters).getOrElse(
      throw new IllegalStateException(
        s"handled filters are undecidable against $path (layout changed " +
          "between filter pushdown and scan planning?)"))
    entries => entries.filter { e =>
      decide(e).getOrElse(
        throw new IllegalStateException(
          s"file '${e.path}' of $path cannot decide a handled " +
            "filter (foreign directory layout?)"))
    }
  }

  /** The columns a pushed filter may be declared HANDLED on (exact
    * partition filtering: the scan itself honors the predicate row for
    * row, Spark does not re-apply it): identity partition columns of
    * leaf-parseable types, on a table whose layout has never carried a
    * hidden transform or spec evolution — exactly the conditions under
    * which a leaf value IS the rows' column value. None otherwise.
    */
  private[graft] def exactPartitionFilterColumns: Option[Seq[String]] = {
    if (transform.isDefined) return None
    val (_, snap) = resolveLive()
    if (specHistOf(snap.meta).nonEmpty) return None
    val schema = storedSchema(snap.meta).getOrElse(return None)
    val ok = partCols.forall(c => schema.fields.find(_.name == c).exists(f =>
      f.dataType == org.apache.spark.sql.types.StringType ||
        f.dataType == org.apache.spark.sql.types.IntegerType ||
        f.dataType == org.apache.spark.sql.types.LongType))
    if (ok) Some(partCols) else None
  }

  /** Typed partition values of a leaf path under the partition schema
    * (Spark's own path escaping); None for an unparseable leaf.
    */
  private def leafPartitionValues(leaf: String,
      partSchema: StructType): Option[org.apache.spark.sql.catalyst.InternalRow] = {
    val bySegment = leaf.split("/").filter(_.nonEmpty).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i < 0) None
      else Some(seg.take(i) ->
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.drop(i + 1)))
    }.toMap
    try Some(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
      partSchema.fields.toSeq.map { f =>
        val raw = bySegment.getOrElse(f.name, return None)
        if (raw == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .DEFAULT_PARTITION_NAME) null
        else f.dataType match {
          case org.apache.spark.sql.types.StringType =>
            org.apache.spark.unsafe.types.UTF8String.fromString(raw)
          case org.apache.spark.sql.types.IntegerType => raw.toInt
          case org.apache.spark.sql.types.LongType => raw.toLong
          case _ => return None
        }
      }))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** T3: the routing decision the transformer stamps on every record. */
  def operation: String = if (uniqueKeys.isEmpty) "insert" else "update"

  /** THE commit choreography, shared by append, upsert, delete, and
    * maintain: stage `df` partitioned by the layout columns, import the
    * staged tree under version-and-writer-unique names (dormant), then
    * publish `carryOver(imported) ++ imported` plus the metadata header
    * (schema stamp, carried-forward append high-water marks) as one
    * manifest create — the commit point. `carryOver` sees the imported
    * relative paths so leaf-rewrite commits can derive "previous files
    * outside the rewritten leaves" from the actual import (never
    * string-formatted from partition values, so value escaping can't
    * diverge).
    *
    * Concurrency: the manifest create is a CAS on the version name
    * ([[Manifests.write]]); losing the race throws
    * [[Manifests.CommitConflictException]] after deleting this writer's
    * imported files — callers ([[withCommitRetry]]) re-resolve the live
    * snapshot and redo their merge against it, so no update is lost.
    */
  private def commit(df0: DataFrame, baseVersion: Long,
      base: TableSnapshot, extraMeta: Map[String, String] = Map.empty)(
      carryOver: Seq[String] => Seq[String]): Seq[String] = {
    val version = nextVersion(baseVersion)
    val token = java.util.UUID.randomUUID().toString.take(8)
    validateLayout(base.meta)
    // every data file this commit writes gets partition values derived
    // under the CURRENT spec (idempotent re-projection for already-
    // derived frames) — on a spec-evolved table this is what migrates
    // rewritten rows and keeps version→spec pruning sound.
    // CHECK constraints guard every row INSIDE the same write plan.
    val df = guardConstraints(withDerivedPartition(df0), constraintsOf(base.meta))
    val plain = commitSchema(storedSchema(base.meta), df.schema)
    // stable column ids: carried from the base, assigned fresh for new
    // columns, stamped into BOTH the schema stamp and the staged
    // parquet files (Spark's native parquet.field.id support) — the
    // indirection renameColumn/dropColumn read through
    val ids = assignIds(colIdsOf(base.meta), plain)
    val hist0 = colHistOf(base.meta)
    val hist = hist0 ++ ids.collect {
      case (n, id) if !hist0.contains(id) =>
        id -> Seq((version, Option(n)))
    }
    val schema = withFieldIds(plain, ids)
    ensureFieldIdConfs()
    val dfStamped = df.select(df.columns.toSeq.map(c =>
      col(c).as(c, schema(schema.fieldIndex(c)).metadata)): _*)
    val staging = new Path(root.getParent, s".staging_v${version}_$token")
    dfStamped.write.mode("overwrite")
      .partitionBy(partCols: _*)
      .option("compression", "snappy")
      .parquet(staging.toString)
    // the branch-point stamp survives every commit on a branch chain —
    // fastForward's ancestry check must see it no matter how many
    // commits the branch accumulated (v1 may have expired by retention)
    val meta = hwmOf(base.meta) ++
      base.meta.get(BranchBaseKey).map(BranchBaseKey -> _) ++
      base.meta.get(ConstraintsKey).map(ConstraintsKey -> _) ++ extraMeta +
      (SchemaKey -> schema.json) +
      (ColIdsKey -> idsJson(ids)) +
      (ColHistKey -> histJson(hist)) +
      (IdsFromKey -> base.meta.getOrElse(IdsFromKey, version.toString)) +
      (TsKey -> System.currentTimeMillis().toString) +
      (LayoutKey -> layoutSpec)
    try {
      val importedWithSize =
        Manifests.importStagedTree(fs, staging, root, s"v$version-$token")
      val imported = importedWithSize.map(_._1)
      // one pass over the just-written files: row counts, column
      // bounds, bloom filters — the manifest entry stamps
      val fileMeta = importedFileMeta(imported, schema)
      val fresh: Map[String, Manifests.FileEntry] =
        importedWithSize.map { case (p, size) =>
          fileMeta.get(p) match {
            case Some(m) =>
              p -> Manifests.FileEntry(p, size, m.rows, m.bounds,
                nulls = m.nulls, ndv = m.ndv, sums = m.sums)
            case None =>
              p -> Manifests.FileEntry(p, size, -1L, Map.empty)
          }
        }.toMap
      val perFileBlooms: BloomStats.Sidecar = fileMeta.collect {
        case (p, m) if m.blooms.nonEmpty => p -> m.blooms
      }
      val carriedPaths = carryOver(imported)
      val fileList = carriedPaths ++ imported
      val bloom = bloomMeta(base.meta, fileList, perFileBlooms, version, token)
      val entries = carriedPaths.map(p => base.entryOf.getOrElse(p,
        Manifests.FileEntry(p, -1L, -1L, Map.empty))) ++
        imported.map(fresh)
      // spec history: carried forward verbatim — or COLLAPSED to its
      // last entry once every live data file is at-or-past the last
      // spec's fromVersion (a maintain(0) migration ends here), which
      // restores the single-epoch fast paths (branching, unconditional
      // inversion)
      val specMeta: Map[String, String] = specHistOf(base.meta) match {
        case Nil => Map.empty
        case hist =>
          def isDeleteName(f: String) = {
            val n = f.substring(f.lastIndexOf('/') + 1)
            n.startsWith("eqdel-") || n.startsWith("posdel-")
          }
          val lastFrom = hist.last._1
          val collapsed =
            if (hist.size > 1 && fileList.forall(f =>
              isDeleteName(f) || fileVersionOf(f).exists(_ >= lastFrom)))
              hist.takeRight(1)
            else hist
          Map(SpecHistKey -> specHistJson(collapsed))
      }
      try publishVersion(version, token, entries, meta ++ bloom ++ specMeta, base)
      catch {
        case e: Manifests.CommitConflictException =>
          // lost the race: un-import our dormant files (and this
          // writer's bloom sidecar — publishVersion already removed its
          // leaf manifests) and let the caller retry against the winner
          imported.foreach(f => fs.delete(new Path(root, f), false))
          fs.delete(new Path(root, s"_graft_bloom_v${version}_$token"), false)
          throw e
      }
      expireSnapshots()
      imported
    } finally fs.delete(staging, true)
  }

  /** SHARDED metadata publish, shared by every commit shape: group
    * `entries` by leaf; an untouched leaf re-references its existing
    * (immutable) leaf manifest, a changed leaf gets exactly one fresh
    * manifest — a key-local commit writes O(changed leaves' files)
    * metadata while the version manifest stays one short `@ref` line
    * per leaf. On a lost CAS race this writer's fresh leaf manifests
    * are deleted before the conflict propagates; callers clean their
    * own imports.
    */
  /** `reuseBaseLeaves = false` forces every leaf manifest to be
    * rewritten even when its path set is unchanged — the [[analyze]]
    * path, whose whole point is replacing the ENTRIES (new stats
    * stamps) under the same paths.
    */
  private def publishVersion(version: Long, token: String,
      entries: Seq[Manifests.FileEntry], meta: Map[String, String],
      base: TableSnapshot, reuseBaseLeaves: Boolean = true): Unit = {
    val baseRefs = refsByLeaf(base)
    val newLeafManifests = scala.collection.mutable.ArrayBuffer.empty[String]
    val refs = entries.groupBy(e => leafOf(e.path)).toSeq.sortBy(_._1)
      .zipWithIndex.map { case ((leaf, leafEntries), i) =>
        baseRefs.get(leaf) match {
          case Some((ref, basePaths))
              if reuseBaseLeaves &&
                basePaths == leafEntries.map(_.path).toSet => ref
          case _ =>
            val name = f"${Manifests.LeafPrefix}v$version-$token-$i%05d"
            Manifests.writeLeafManifest(fs, root, name, leafEntries)
            newLeafManifests += name
            name
        }
      }
    try Manifests.write(fs, root, version,
      refs.map(Manifests.RefMark + _), meta, chainPrefix)
    catch {
      case e: Manifests.CommitConflictException =>
        newLeafManifests.foreach(n => fs.delete(new Path(root, n), false))
        throw e
    }
  }

  /** Sequential commit versions (Iceberg's sequence numbers): racing
    * writers that resolved the same base compute the SAME next version,
    * which is what makes the manifest-name CAS detect the conflict.
    */
  private def nextVersion(after: Long): Long = after + 1L

  /** Optimistic-concurrency retry: run `body` (which must re-resolve
    * the live snapshot itself — every public op does); on a lost commit
    * race, rerun it against the winner's snapshot, up to 5 attempts.
    */
  private def withCommitRetry[T](body: => T): T = {
    val maxAttempts = 5
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: Manifests.CommitConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retention GC, cheap per-commit half (Iceberg `expire_snapshots`):
    * drop manifests beyond `keepLast` and the expired versions' files
    * that no retained manifest still references. TAGGED versions are
    * never expired (Iceberg's refs semantics — a tag pins its snapshot
    * past count-based retention). Manifest-driven only — no directory
    * walk — so it stays O(retained manifests) metadata I/O on the
    * ingest hot path. Runs after each commit point, never before.
    */
  private def expireSnapshots(keepLast: Int = retainVersions): Unit = {
    val all = versions
    if (all.size <= keepLast) return
    // tags pin MAIN-chain snapshots; branch chains expire purely by count
    val tagged = if (branch == "main") tags.values.toSet else Set.empty[Long]
    val (older, recent) = all.splitAt(all.size - keepLast)
    expireVersions(older.filterNot(tagged), older.filter(tagged) ++ recent)
  }

  /** TIME-based retention (Iceberg's `expire_snapshots(older_than)`):
    * expire every snapshot whose commit timestamp (stamped in the
    * manifest at commit) is older than `cutoffMillis` — always keeping
    * the live snapshot, tagged versions, and snapshots whose manifests
    * predate the timestamp stamp. Returns the expired versions.
    */
  def expireOlderThan(cutoffMillis: Long): Seq[Long] = {
    val all = versions
    val live = all.lastOption.getOrElse(return Nil)
    val tagged = tags.values.toSet
    val expired = all.filter { v =>
      v != live && !tagged(v) &&
        Manifests.snapshotAt(fs, root, v, chainPrefix)
          .flatMap(_.meta.get(TsKey)).flatMap(_.toLongOption)
          .exists(_ < cutoffMillis)
    }
    if (expired.nonEmpty)
      expireVersions(expired, all.filterNot(expired.contains))
    expired
  }

  /** Every version-chain prefix present under the table root: the main
    * chain plus any branches — the GC referenced-set must span them
    * all, because chains share leaf manifests and data files by name.
    */
  private def chainPrefixes(): Seq[String] = {
    val branchRe = "^(_graft_branch_[A-Za-z0-9-]+_v)\\d+$".r
    val onDisk =
      if (!exists) Seq.empty
      else fs.listStatus(root).toSeq.map(_.getPath.getName).flatMap {
        case branchRe(prefix) => Some(prefix)
        case _ => None
      }.distinct
    (Manifests.Prefix +: onDisk).distinct
  }

  /** Snapshots of every OTHER chain (all their retained versions) —
    * the cross-chain half of the GC referenced-set.
    */
  private def otherChainSnapshots(): Seq[TableSnapshot] =
    chainPrefixes().filterNot(_ == chainPrefix).flatMap { pre =>
      Manifests.versions(fs, root, pre)
        .flatMap(v => Manifests.snapshotAt(fs, root, v, pre))
        .map(expand)
    }

  /** Shared GC core: delete `expired` versions' manifests plus every
    * data file / bloom sidecar / leaf manifest they reference that no
    * `retained` version of THIS chain — and no version of any OTHER
    * chain — still does.
    */
  private def expireVersions(expired: Seq[Long], retained: Seq[Long]): Unit = {
    if (expired.isEmpty) return
    val retainedSnaps = retained
      .flatMap(v => Manifests.snapshotAt(fs, root, v, chainPrefix)).map(expand) ++
      otherChainSnapshots()
    val referenced = retainedSnaps.flatMap(_.files).toSet
    val referencedSidecars = retainedSnaps.flatMap(s => bloomSidecarsOf(s.meta)).toSet
    val referencedRefs = retainedSnaps.flatMap(_.refs).toSet
    expired.foreach { v =>
      Manifests.snapshotAt(fs, root, v, chainPrefix).map(expand).foreach { s =>
        s.files.filterNot(referenced)
          .foreach(f => fs.delete(new Path(root, f), false))
        bloomSidecarsOf(s.meta).filterNot(referencedSidecars)
          .foreach(n => fs.delete(new Path(root, n), false))
        // leaf manifests referenced by no retained version expire with
        // their snapshot (they are immutable, so sharing is by name)
        s.refs.filterNot(referencedRefs)
          .foreach(n => fs.delete(new Path(root, n), false))
      }
      fs.delete(new Path(root, s"$chainPrefix$v"), false)
    }
  }

  /** Tag file name pattern: `.graft_tag_<name>_v<version>` — the same
    * crash-safe versioned create-only publish as the change-feed
    * cursors (a readable tag exists at every crash point; max wins).
    */
  private def tagFileName(name: String, version: Long): String =
    s".graft_tag_${name}_v$version"

  /** The table's named snapshot TAGS (Iceberg's refs): tag name → the
    * pinned version. Tagged snapshots survive both count- and
    * time-based retention until [[dropTag]].
    */
  def tags: Map[String, Long] =
    if (!exists) Map.empty
    else fs.listStatus(root).map(_.getPath.getName).toSeq
      .filter(_.startsWith(".graft_tag_"))
      .flatMap { n =>
        val body = n.stripPrefix(".graft_tag_")
        val i = body.lastIndexOf("_v")
        if (i <= 0) None
        else body.drop(i + 2).toLongOption.map(v => body.take(i) -> v)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

  /** Pin `version` under `name`. Re-tagging forward (a newer version)
    * is allowed in place; re-tagging BACKWARD requires [[dropTag]]
    * first — the max-wins crash recovery could otherwise resurrect the
    * newer pointer.
    */
  def tag(name: String, version: Long): Unit = {
    require(branch == "main", "tags pin main-chain snapshots; tag via the main handle")
    require(name.matches("[A-Za-z0-9-]+"),
      s"tag name must be [A-Za-z0-9-]+, got '$name'")
    // `VERSION AS OF <ref>` resolves a numeric ref as a snapshot
    // version FIRST — an all-digit tag name (e.g. '20240301') would be
    // silently shadowed and could pin a wrong snapshot. Refused at
    // creation so the ambiguity can never exist.
    require(!name.forall(_.isDigit),
      s"tag name '$name' is all digits — it would be shadowed by " +
        "snapshot-version resolution in VERSION AS OF; include a letter " +
        "or dash")
    require(versions.contains(version),
      s"cannot tag unknown or expired version $version")
    tags.get(name).foreach { cur =>
      require(version >= cur,
        s"tag '$name' points at v$cur; dropTag before re-tagging backward to v$version")
    }
    val fin = new Path(root, tagFileName(name, version))
    val tmp = new Path(root, s"${tagFileName(name, version)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(Array.emptyByteArray) finally out.close()
    if (!fs.exists(fin) && !fs.rename(tmp, fin))
      throw new java.io.IOException(s"tag publish failed for '$name'")
    fs.delete(tmp, false)
    // sweep superseded pointers AFTER the new one is durable
    fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith(s".graft_tag_${name}_v") && n != tagFileName(name, version))
      .filter(_.stripPrefix(s".graft_tag_${name}_v").toLongOption.exists(_ < version))
      .foreach(n => fs.delete(new Path(root, n), false))
  }

  /** Remove a tag; the snapshot it pinned becomes expirable again. */
  def dropTag(name: String): Unit =
    if (exists) fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(s".graft_tag_${name}_v"))
      .foreach(n => fs.delete(new Path(root, n), false))

  /** Read the snapshot a tag pins (time travel by name). */
  def readTag(name: String): DataFrame =
    readAt(tags.getOrElse(name,
      throw new NoSuchElementException(s"no tag '$name' under $path")))

  /** The branches present under this table root (chain names other
    * than main).
    */
  def branches: Seq[String] = {
    val branchRe = "^_graft_branch_([A-Za-z0-9-]+)_v\\d+$".r
    if (!exists) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName).flatMap {
      case branchRe(name) => Some(name)
      case _ => None
    }.distinct.sorted
  }

  /** Create a BRANCH at this chain's live snapshot (Iceberg refs / the
    * write-audit-publish staging pattern): an independent version chain
    * in the same table root whose v1 references the live snapshot's
    * leaf manifests by name — O(1) data I/O. Returns the branch handle;
    * commits through it never touch this chain, and GC on either chain
    * never sweeps files the other references. Publish audited branch
    * work back with [[fastForward]].
    */
  def createBranch(name: String): IcebergLikeTable = {
    require(name != "main" && name.matches("[A-Za-z0-9-]+"),
      s"branch name must be [A-Za-z0-9-]+ and not 'main', got '$name'")
    // same refusal tags get: VERSION AS OF resolves numeric versions
    // FIRST, so an all-digit branch name could never be addressed (or
    // worse, silently read the same-numbered main-chain snapshot)
    require(!name.forall(_.isDigit),
      s"branch name cannot be all digits (it would be shadowed by " +
        s"numeric VERSION AS OF resolution), got '$name'")
    val b = this.copy(branch = name)
    require(b.currentVersion.isEmpty, s"branch '$name' already exists under $path")
    val (v, live) = resolveLive()
    require(v > 0, "cannot branch a table that has never committed")
    // branch chains restart version numbering at 1, so a branch-written
    // file's name-embedded version cannot be told apart from an
    // inherited main-chain file's — the file→spec mapping a multi-epoch
    // history needs. Single-epoch tables (never evolved, or collapsed
    // by a maintain(0) migration) branch freely.
    require(specHistOf(live.meta).size <= 1,
      "cannot branch a table with a live multi-epoch partition-spec " +
        "history: run maintain(fileThreshold = 0) to migrate every file " +
        "to the current spec first")
    val lines =
      if (live.refs.nonEmpty) live.refs.map(Manifests.RefMark + _)
      else live.files
    // stamp the branch point (and clear any stale branch/ff markers the
    // source meta carried) — fastForward's ancestry check reads it
    val meta = live.meta - BranchBaseKey - FfKey + (BranchBaseKey -> v.toString)
    Manifests.write(fs, root, 1L, lines, meta, b.chainPrefix)
    b
  }

  /** An existing branch's handle (validated lazily by the layout check
    * at its first commit; reads need no validation).
    */
  def forBranch(name: String): IcebergLikeTable = this.copy(branch = name)

  /** FAST-FORWARD publish (the WAP commit): this chain commits the
    * `from` chain's live snapshot as its own next version — one
    * manifest create referencing the same leaf manifests, O(1) data
    * I/O. The published metadata keeps THIS chain's append high-water
    * marks (stream replay cursors are chain-local) and takes the
    * branch's schema/stats/bloom stamps (they describe the published
    * files). Returns the new live version of this chain.
    */
  def fastForward(from: IcebergLikeTable): Long = withCommitRetry {
    require(from.path == path, "fast-forward source must share the table root")
    val (fromV, fromSnap) = from.resolveLive()
    require(fromV > 0, s"branch '${from.branch}' has no committed snapshot")
    val (liveVersion, live) = resolveLive()
    // ANCESTRY check (real Iceberg's fast_forward contract): the
    // target's live snapshot must be an ancestor of the branch — either
    // the target is still AT the recorded branch point, or its live
    // snapshot was itself published by a fast-forward from this same
    // branch (sequential publishes). Anything else means commits landed
    // on the target after the branch was cut, and a 'fast-forward'
    // would silently discard them from the live view. Branches created
    // before the branch-point stamp existed carry no base and skip the
    // check (legacy permissiveness, like the unstamped-schema reads).
    fromSnap.meta.get(BranchBaseKey).flatMap(_.toLongOption).foreach { bp =>
      val ancestor = liveVersion == bp ||
        live.meta.get(FfKey).contains(from.branch)
      if (!ancestor) throw new IllegalStateException(
        s"not a fast-forward: '${branch}' is at v$liveVersion but branch " +
          s"'${from.branch}' was cut at v$bp and '${branch}' has committed " +
          "since; merge the branch (or re-branch and replay) instead")
    }
    validateLayout(live.meta)
    validateLayout(fromSnap.meta)
    val newVersion = nextVersion(liveVersion)
    val meta = hwmOf(live.meta) ++
      fromSnap.meta.view.filterKeys(k => !k.startsWith(HwmPrefix)).toMap -
      BranchBaseKey - FfKey +
      (FfKey -> from.branch) +
      (TsKey -> System.currentTimeMillis().toString)
    val lines =
      if (fromSnap.refs.nonEmpty) fromSnap.refs.map(Manifests.RefMark + _)
      else fromSnap.files
    Manifests.write(fs, root, newVersion, lines, meta, chainPrefix)
    expireSnapshots()
    newVersion
  }

  /** Delete a branch's manifests; its unshared files become orphans the
    * next [[vacuum]] sweeps.
    */
  def dropBranch(name: String): Unit = {
    require(name != "main", "cannot drop the main chain")
    val pre = s"_graft_branch_${name}_v"
    Manifests.versions(fs, root, pre).foreach(v =>
      fs.delete(new Path(root, s"$pre$v"), false))
  }

  /** Change a keyed table's bucket count — necessarily a FULL-TABLE
    * rewrite (gbucket is derived from the keys and baked into every
    * leaf path), committed as one snapshot under the new layout.
    * Returns the handle with the new layout; further writes must go
    * through it (commits via the old declaration fail the layout
    * check). Single-writer operation, like [[vacuum]].
    */
  def rebucket(newBuckets: Int): IcebergLikeTable = {
    require(uniqueKeys.nonEmpty, "rebucket applies to keyed tables")
    require(newBuckets >= 1, "need at least one bucket")
    val t2 = this.copy(numBuckets = newBuckets)
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta) // this handle must match the live layout
    if (snap.entries.isEmpty) return t2
    val rows = readSnapshot(snap).drop(bucketCol)
    // the migration commit runs through the NEW handle; the stored
    // layout stamp is the old spec by construction, so it is cleared
    // from the base meta for this one commit (every later commit
    // validates against the new stamp)
    val (v2, s2) = t2.resolveLive()
    require(v2 == liveVersion, "table changed under rebucket (single-writer op)")
    t2.commit(t2.withBucket(rows), v2, s2.copy(meta = s2.meta - LayoutKey))(_ => Nil)
    t2
  }

  /** EVOLVE the hidden-partitioning spec (Iceberg's partition-spec
    * evolution — `ALTER TABLE .. SET PARTITION SPEC`, the move every
    * growing event table eventually makes: `days(ts)` while small,
    * `hours(ts)` once a day of data stops fitting a scan): a
    * METADATA-ONLY commit — no data file moves or rewrites, O(1) data
    * I/O at any table size. Existing files stay in their old-spec
    * leaves; new writes derive under the new spec; and reads prune
    * each file under the spec that GOVERNED its write
    * ([[transformBoundsFn]] — the spec history stamped here maps the
    * file's name-embedded write version to its epoch, because
    * inverting an old day ordinal as if it were an hour ordinal would
    * silently prune matching files). `maintain(fileThreshold = 0)`
    * migrates old files to the new layout (every rewrite re-derives,
    * see [[withDerivedPartition]]); once no old-epoch file is live the
    * history collapses back to one entry and branching re-opens.
    *
    * Key-less hidden-partitioned tables only: a keyed merge routes by
    * the derived (partition, bucket) leaf, so a key stored under the
    * old spec would be unreachable to its own upsert. Returns the
    * handle declaring the new spec; further writes must go through it
    * (commits via the old declaration fail the layout check).
    * Single-writer operation, like [[rebucket]].
    */
  def evolvePartitionSpec(newSpec: String): IcebergLikeTable = {
    val cur = transform.getOrElse(throw new IllegalArgumentException(
      "evolvePartitionSpec applies to hidden-partitioned tables " +
        "(declare partitionTransform at create time)"))
    require(uniqueKeys.isEmpty,
      "cannot evolve the partition spec of a keyed table: upserts route " +
        "by the derived (partition, bucket) leaf, and a key written " +
        "under the old spec would be unreachable to its own merge")
    require(branch == "main",
      "partition-spec evolution commits through the main handle")
    val nt = PartitionTransforms.parse(newSpec)
    require(nt.spec != cur.spec,
      s"table already partitions by ${cur.spec}")
    nt.sources.foreach(src => require(src != partitionCol,
      s"partition transform source '$src' must differ from the " +
        s"derived partition column '$partitionCol'"))
    // the derived partition value is LONG for the single transforms
    // and STRING for a composite (multi) spec: widening long→string is
    // handled by re-stamping the partition column's schema type (old
    // numeric leaf values parse as strings), but NARROWING
    // string→long cannot — existing composite leaf values would not
    // parse under a numeric stamp
    def partType(t: PartitionTransforms.Transform):
        org.apache.spark.sql.types.DataType = t match {
      case _: PartitionTransforms.Multi |
           _: PartitionTransforms.Identity =>
        org.apache.spark.sql.types.StringType
      case _ => LongType
    }
    require(!(partType(cur) == org.apache.spark.sql.types.StringType &&
        partType(nt) == LongType) || currentVersion.isEmpty,
      "cannot evolve a composite (string-valued) partition spec to a " +
        "numeric one on a committed table: existing leaf values would " +
        "not parse under the numeric partition type — truncate-reload " +
        "or create a new table")
    val evolved = this.copy(partitionTransform = Some(nt.spec))
    if (currentVersion.isEmpty) return evolved // nothing written yet
    withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      validateLayout(snap.meta)
      require(branches.isEmpty,
        "cannot evolve the partition spec while branches exist: branch " +
          "version numbering cannot disambiguate spec epochs — " +
          "fast-forward or drop the branches first")
      val unknown = snap.dataFiles.filterNot(f => fileVersionOf(f).isDefined)
      require(unknown.isEmpty,
        s"cannot evolve: ${unknown.size} live file(s) predate the " +
          "versioned-name protocol and their spec epoch would be " +
          "ambiguous — run maintain(fileThreshold = 0) to rewrite them first")
      val version = nextVersion(liveVersion)
      val hist0 = specHistOf(snap.meta)
      val hist = (if (hist0.isEmpty) Seq((0L, cur.spec)) else hist0) :+
        ((version, nt.spec))
      // a type-widening evolution (days→multi) re-stamps the hidden
      // partition column as STRING: old numeric leaf values parse as
      // strings, new composite writes type-match the stamp
      val schemaMeta: Map[String, String] =
        storedSchema(snap.meta) match {
          case Some(s) if s.fieldNames.contains(partitionCol) &&
              partType(nt) != partType(cur) =>
            Map(SchemaKey -> StructType(s.fields.map(f =>
              if (f.name == partitionCol) f.copy(dataType = partType(nt))
              else f)).json)
          case _ => Map.empty
        }
      val meta = snap.meta - FfKey ++ schemaMeta +
        (SpecHistKey -> specHistJson(hist)) +
        (TsKey -> System.currentTimeMillis().toString) +
        (LayoutKey -> layoutSpecFor(Some(nt)))
      val lines =
        if (snap.refs.nonEmpty) snap.refs.map(Manifests.RefMark + _)
        else snap.files
      Manifests.write(fs, root, version, lines, meta, chainPrefix)
      expireSnapshots()
    }
    evolved
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
    // referenced-set spans EVERY chain (main + branches): a branch's
    // files are live even when no main manifest references them
    val snaps = versions
      .flatMap(v => Manifests.snapshotAt(fs, root, v, chainPrefix)).map(expand) ++
      otherChainSnapshots()
    val referenced = snaps.flatMap(_.files).toSet
    walkDataFiles().filterNot(referenced)
      .foreach(f => fs.delete(new Path(root, f), false))
    // bloom-sidecar debris: a sidecar no retained manifest references is
    // a crashed or conflict-losing commit's leftover
    val referencedSidecars = snaps.flatMap(s => bloomSidecarsOf(s.meta)).toSet
    if (exists) fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("_graft_bloom_") && !referencedSidecars.contains(n))
      .foreach(n => fs.delete(new Path(root, n), false))
    // leaf-manifest debris: written by a commit that crashed before (or
    // lost) its version-manifest CAS
    val referencedRefs = snaps.flatMap(_.refs).toSet
    if (exists) fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith(Manifests.LeafPrefix) && !referencedRefs.contains(n))
      .foreach(n => fs.delete(new Path(root, n), false))
    // commit-lock debris: a lock whose manifest was never published is
    // a writer that crashed between claim and publish — clear it so the
    // version name is claimable again (safe under vacuum's no-in-flight
    // precondition).
    chainPrefixes().foreach { pre =>
      if (exists) fs.listStatus(root).map(_.getPath.getName)
        .filter(n => n.startsWith(s".$pre") && n.endsWith(".lock"))
        .foreach { n =>
          val v = n.stripPrefix(s".$pre").stripSuffix(".lock")
          if (v.toLongOption.exists(ver =>
              !fs.exists(new Path(root, s"$pre$ver"))))
            fs.delete(new Path(root, n), false)
        }
    }
  }

  /** S10 append path (`operation='insert'`). Appends never invalidate
    * prior files, so every retained snapshot stays fully readable.
    */
  def append(df: DataFrame): Unit = append(df, None)

  /** Append with exactly-once micro-batch replay semantics (the gap an
    * at-least-once delivery — the reference's Firehose retries,
    * `web-analytics-parquet/cdk_stacks/firehose.py:131-133` — leaves
    * open for key-less tables): `appendId = (streamId, batchId)` records
    * a per-stream high-water mark in the manifest metadata at the commit
    * point, atomically with the data. A batch replayed after a crash
    * between the commit and the checkpoint write resolves
    * `batchId <= hwm` and is skipped, so the table is byte-identical to
    * a single delivery — real Iceberg sinks dedupe replayed epochs the
    * same way (batch id in snapshot summary). The mark is carried
    * forward by every commit (upsert/delete/maintain included), so it
    * survives unrelated table activity; marks from different streams are
    * independent.
    */
  def append(df: DataFrame, appendId: Option[(String, Long)]): Unit =
    withCommitRetry { appendOnce(df, appendId) }

  private def appendOnce(df: DataFrame, appendId: Option[(String, Long)]): Unit = {
    val (liveVersion, snap) = resolveLive()
    if (alreadyApplied(snap.meta, appendId)) return
    val extra = appendId.map { case (s, b) => hwmKey(s) -> b.toString }.toMap
    commit(withBucket(withDerivedPartition(df)), liveVersion, snap, extra)(
      _ => snap.files)
  }

  /** OVERWRITE the table content in one snapshot commit (Iceberg's
    * INSERT OVERWRITE / the batch `SaveMode.Overwrite`): the new
    * version's file list is the batch alone — no previous file carries
    * over. History stays create-only: prior snapshots remain readable
    * (time travel, rollback) until retention expires them, and the CDC
    * diff across the commit is the full retraction+reload it really is.
    */
  def overwrite(df: DataFrame, appendId: Option[(String, Long)] = None): Unit =
    withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      if (!alreadyApplied(snap.meta, appendId)) {
        val extra = appendId.map { case (s, b) => hwmKey(s) -> b.toString }.toMap
        commit(withBucket(withDerivedPartition(df)), liveVersion, snap, extra)(
          _ => Nil)
      }
    }

  /** DYNAMIC partition overwrite (Iceberg/Delta's
    * `partitionOverwriteMode=dynamic`, Hive's classic INSERT OVERWRITE
    * with dynamic partitions): ONE snapshot commit that replaces
    * exactly the partition leaves the batch writes to — every other
    * leaf carries over by reference, untouched. Replaced leaves drop
    * their delete files too (every data file they applied to is gone
    * with the leaf). At 100 TB this is the idempotent daily-backfill
    * primitive: re-running a day's pipeline swaps that day's leaves
    * and never rewrites — or even lists — the rest of the table.
    * An empty batch replaces nothing (no leaves written → full carry).
    */
  def overwritePartitions(df: DataFrame,
      appendId: Option[(String, Long)] = None): Unit =
    withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      if (!alreadyApplied(snap.meta, appendId)) {
        val extra = appendId.map { case (s, b) => hwmKey(s) -> b.toString }.toMap
        commit(withBucket(withDerivedPartition(df)), liveVersion, snap, extra)(
          fresh => {
            // the replacement unit is the PARTITION, not the physical
            // leaf: on a keyed table a leaf is (partition, bucket) and
            // the batch only hashes into SOME buckets — matching full
            // leaves would silently carry the partition's other buckets
            // and mix stale rows into a "replaced" partition. Keying on
            // the partition path prefix replaces the whole partition.
            val partKey: String => String =
              if (uniqueKeys.isEmpty) leafOf
              else f => { val i = f.indexOf('/'); if (i < 0) "" else f.substring(0, i) }
            val replaced = fresh.map(partKey).toSet
            snap.files.filterNot(f => replaced.contains(partKey(f)))
          })
      }
    }

  /** Conditional overwrite (Delta's `replaceWhere`): atomically delete
    * the rows matching `condition` and insert `df`, in ONE snapshot
    * commit — the arbitrary-predicate backfill (`ts BETWEEN ...`) that
    * dynamic partition overwrite can't scope. Every batch row must
    * satisfy the predicate (checked up front, Delta's constraint), so
    * the operation is exactly "replace the predicate's region".
    * Discovery composes the table's stats/bloom pruning and rewrites
    * only files that actually CONTAIN matches (their non-matching
    * neighbours are carried value-identical through the rewrite);
    * everything else carries over by reference. Returns rows removed.
    */
  def replaceWhere(condition: Column, df: DataFrame): Long =
    replaceWhere(condition, df, requireBatchInRegion = true)

  /** [[replaceWhere]] with a choice of batch contract:
    * `requireBatchInRegion = true` is Delta's replaceWhere (every batch
    * row must satisfy the predicate — refused up front otherwise);
    * `false` is the DataSourceV2 / Iceberg `overwrite(filters)`
    * contract — delete the rows matching the predicate, then append
    * the WHOLE batch, matching or not, in the same snapshot commit.
    */
  def replaceWhere(condition: Column, df: DataFrame,
      requireBatchInRegion: Boolean): Long = {
    // strict mode enforces the region contract PER ROW inside the write
    // plan (the CHECK-constraint guard pattern): zero extra passes over
    // the batch — the old up-front `filter(!cond).isEmpty` probe was a
    // full second evaluation, and on a non-deterministic source the
    // batch could pass the probe yet produce violating rows in the
    // write pass. A violating row throws DURING the staging write,
    // before the manifest create, so nothing partial publishes and the
    // normal abort path cleans the staged files.
    val guarded =
      if (!requireBatchInRegion) df
      else df.filter(when(coalesce(condition, lit(false)), lit(true))
        .otherwise(raise_error(concat(
          lit("replaceWhere: batch row outside the replaced region " +
            "(every new row must satisfy the predicate): "),
          to_json(struct(df.columns.toSeq.map(col): _*))))))
    withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      val previous = snap.files
      val newRows = withBucket(withDerivedPartition(guarded))
      val candidates =
        if (previous.isEmpty) Nil
        else prunedFiles(snap, storedSchema(snap.meta), condition)
      val hits =
        if (candidates.isEmpty) Array.empty[(String, Long)]
        else fileHits(snap, condition, candidates)
      val deleted = hits.map(_._2).sum
      val affectedFiles = hits.map(_._1).toSet
      require(affectedFiles.subsetOf(previous.toSet),
        s"replaceWhere discovery resolved files outside the snapshot: " +
          s"${affectedFiles.diff(previous.toSet).take(3).mkString(", ")}")
      // nothing to delete AND nothing to insert → no snapshot at all
      // (replaying an empty backfill must not churn versions)
      if (affectedFiles.isEmpty && newRows.isEmpty) 0L
      else {
        val content =
          if (affectedFiles.isEmpty) newRows
          else morRead(snap, affectedFiles.toSeq.sorted)
            .filter(!coalesce(condition, lit(false)))
            .unionByName(newRows)
        commit(content, liveVersion, snap)(
          _ => previous.filterNot(affectedFiles))
        deleted
      }
    }
  }

  /** Range-CLUSTERED append: rows range-partitioned and sorted on
    * `clusterCols` before the write, so each emitted file covers a
    * narrow, non-overlapping slice of the cluster-column domain — the
    * layout that makes the manifest bounds ([[FileStats]]) sharp. With
    * the default hash-derived task layout every file spans ~the full
    * value range and [[readWhere]] can only prune what partition values
    * already cut; after a clustered append a point/range predicate on
    * the cluster columns prunes to the covering files alone
    * (IcebergStatsSpec pins 1-of-N). This is Iceberg's
    * write-distribution-mode=range + sort-order story: cluster on the
    * columns queries slice by (time, tenant, severity), and the
    * planning-time skip does the rest. Cost: one range exchange of the
    * batch (sampling + shuffle), never the table.
    *
    * `nFiles` bounds the number of range slices (the partitionBy split
    * happens inside each range task, so a leaf holds at most `nFiles`
    * files per clustered append). Stats stamping follows the table's
    * `statsColumns` declaration — declare the cluster columns there or
    * the narrow bounds are never recorded.
    */
  def appendClustered(df: DataFrame, clusterCols: Seq[String],
      nFiles: Int = 16, appendId: Option[(String, Long)] = None): Unit = {
    require(clusterCols.nonEmpty, "appendClustered needs cluster columns")
    val shaped = withBucket(withDerivedPartition(df))
      .repartitionByRange(nFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
    withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      if (!alreadyApplied(snap.meta, appendId)) {
        val extra = appendId.map { case (s, b) => hwmKey(s) -> b.toString }.toMap
        commit(shaped, liveVersion, snap, extra)(_ => snap.files)
      }
    }
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
  def upsert(batch: DataFrame, orderCol: String): Unit =
    upsert(batch, orderCol, None)

  /** Upsert with the same replay high-water mark as [[append]]. The
    * order-aware merge is already replay-IDEMPOTENT (a replayed batch
    * can't clobber newer rows), but the mark makes the replay a clean
    * SKIP: no leaf rewrite, no new snapshot — exactly-once work, not
    * just exactly-once effect.
    */
  def upsert(batch: DataFrame, orderCol: String,
      appendId: Option[(String, Long)]): Unit =
    withCommitRetry { mergeOnce(batch, None, orderCol, appendId) }

  /** Full MERGE in ONE snapshot commit — including the
    * `WHEN MATCHED ... THEN DELETE` clause real Iceberg MERGE carries,
    * which upsert+delete as two commits cannot give atomically:
    * `batch` rows update-or-insert by the unique keys; `deleteKeys`
    * rows (the unique key columns, the partition column — it routes
    * the tombstone to its leaf — plus `orderCol`) are TOMBSTONES —
    * the stored row with that key is removed iff the tombstone wins
    * the order comparison (a replayed OLD delete cannot erase a newer
    * row; order ties prefer the delete, SQL MERGE's
    * delete-clause-first convention), and a tombstone for an absent
    * key is a no-op (WHEN NOT MATCHED: ignore). One snapshot commit
    * covers both effects: readers see before-or-after, never the
    * upserted half without the deletes; the commit's CDC diff carries
    * the update AND delete rows together; and the exactly-once
    * `appendId` mark covers both (no partial-replay window).
    */
  def merge(batch: DataFrame, deleteKeys: DataFrame, orderCol: String,
      appendId: Option[(String, Long)] = None): Unit =
    withCommitRetry { mergeOnce(batch, Some(deleteKeys), orderCol, appendId) }

  /** Internal tombstone marker carried through the merge window; never
    * stored (dropped before the write).
    */
  private val TombCol = "_graft_tombstone"

  private def mergeOnce(batch0: DataFrame, deleteKeys0: Option[DataFrame],
      orderCol: String, appendId: Option[(String, Long)]): Unit = {
    require(uniqueKeys.nonEmpty, "upsert/merge requires declared unique_keys")
    // hidden partitioning: derive the partition value for the batch and
    // the tombstones from the transform's source column (a tombstone
    // needs the source value to route — e.g. the row's timestamp)
    val batch = withDerivedPartition(batch0)
    val deleteKeys = deleteKeys0.map(withDerivedPartition)
    val keyCols = uniqueKeys.map(col)
    val tombCols = (uniqueKeys :+ partitionCol :+ orderCol).distinct
    deleteKeys.foreach { dk =>
      val missing = tombCols.filterNot(dk.columns.contains)
      require(missing.isEmpty,
        s"deleteKeys must carry the unique keys, the partition column and " +
          s"'$orderCol'; missing: ${missing.mkString(", ")}")
    }
    val incoming = deleteKeys match {
      case None => batch.withColumn(TombCol, lit(false))
      case Some(dk) => batch.withColumn(TombCol, lit(false))
        .unionByName(
          dk.select(tombCols.map(col): _*).withColumn(TombCol, lit(true)),
          allowMissingColumns = true)
    }
    // last-write-wins dedup INSIDE the combined batch; an order tie
    // between an upsert and a tombstone prefers the tombstone
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(orderCol).desc, col(TombCol).desc)
    val deduped = withBucket(incoming
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn"))

    val (liveVersion, snap) = resolveLive()
    if (alreadyApplied(snap.meta, appendId)) return
    val extra = appendId.map { case (s, b) => hwmKey(s) -> b.toString }.toMap
    val previous = snap.files
    // affected (event, bucket) leaves only — bounded by the batch's
    // distinct key-derived pairs (≤ |event| × numBuckets), never by table
    // size; this collect is O(pairs), not O(data).
    val pairs = deduped.select(partitionCol, bucketCol).distinct()
      .collect().map(r => (r.get(0), r.getInt(1))).toSeq
    // an empty (or fully-invalidated) micro-batch commits nothing — the
    // reduce below would otherwise throw on zero pairs and kill the
    // foreachBatch streaming query (Ingest.startIcebergIngest).
    if (pairs.isEmpty) return

    // the affected-leaf set comes from the PAIRS, not the files the
    // rewrite happens to emit: a leaf whose batch rows are all WINNING
    // TOMBSTONES writes no file, yet must still drop its previous
    // files from the manifest. Path segments follow Spark's own
    // partition-path escaping (null/empty → the Hive default name), so
    // values round-trip exactly as partitionBy lays them out.
    val affectedLeaves = pairs.map { case (e, b) =>
      leafPathOf(Seq(e, b))
    }.toSet

    // Snapshot commit: stage the rewritten leaves, import, publish a
    // manifest carrying over every live file OUTSIDE the affected
    // leaves. Readers on the previous version keep their complete file
    // set until retention expires it.
    def finish(merged: DataFrame): Unit =
      commit(merged.filter(!col(TombCol)).drop(TombCol), liveVersion, snap,
        extra)(_ => previous.filterNot(f => affectedLeaves.contains(leafOf(f))))

    if (previous.isEmpty) { finish(deduped); return }

    val leafPred: Column = pairs.map { case (e, b) =>
      col(partitionCol) <=> lit(e) && col(bucketCol) <=> lit(b)
    }.reduce(_ || _)
    // both predicate columns are partition columns → partition pruning
    // makes this read touch only the affected leaves' files.
    val old = readSnapshot(snap).filter(leafPred)
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
      .withColumn(TombCol, lit(false))
      .unionByName(deduped.withColumn("_is_new", lit(1)),
        allowMissingColumns = true)
      .withColumn("_rn", row_number().over(mergeW))
      .filter(col("_rn") === 1)
      .drop("_rn", "_is_new")
    finish(merged)
  }

  private[weblog] def leafOf(relFile: String): String = {
    val i = relFile.lastIndexOf('/')
    if (i < 0) "" else relFile.substring(0, i)
  }

  /** Snapshot + stored schema when the pinned-or-live snapshot is
    * ELIGIBLE for the native V2 batch scan ([[GraftNativeScan]]):
    * schema-stamped and size-stamped. Rename/drop epochs read natively
    * through per-epoch reader schemas; POSITIONAL delete files apply
    * natively as a per-reader (file, ordinal) skip, and EQUALITY delete
    * files as a per-reader sequence-scoped key-tuple mask (r11) — both
    * when their stamped tuple counts fit the broadcast budget.
    * Equality tuples additionally require byte-canonical key types
    * (UnsafeRow equality is the membership test — float/double NaN and
    * signed zeros would break it). r12: eq deletes COMPOSE with rename
    * epochs — each delete file's key columns resolve through the column
    * history at its own `deleteSeq`, each data file's at its write
    * version — provided every live file (data or delete) resolves EVERY
    * key column to a physical name; a file predating a key column (or
    * whose physical twin belongs to a dead id) would read NULL keys,
    * and a null tuple must never probe the mask (UnsafeRow equality
    * would match null-to-null where the V1 anti-join's null-rejecting
    * condition keeps the row) — such snapshots read through the bridge.
    */
  private[weblog] def nativeScanSnapshot(
      pinned: Option[Long]): Option[(TableSnapshot, StructType)] = {
    val snap = pinned match {
      case Some(v) => snapshotAt(v)
      case None => resolveLive()._2
    }
    // every delete entry must be stamped and in budget: the tuples are
    // collected to the driver and broadcast (the same posture as the
    // V1 path's broadcast anti-join — bounded, because maintain()
    // compacts delete files away at the threshold)
    val delsOk = snap.deleteEntries.forall(_.rowCount >= 0L) &&
      snap.deleteEntries.map(_.rowCount).sum <=
        IcebergLikeTable.NativePosDeleteTupleBudget &&
      // byte-based twin cap (r12): 4M tuples of WIDE string keys could
      // still make an uncomfortable broadcast — the stamped compressed
      // sizes bound the decoded footprint to the same order
      snap.deleteEntries.map(e => math.max(0L, e.size)).sum <=
        IcebergLikeTable.NativeDeleteBytesBudget
    val stored = storedSchema(snap.meta)
    val eqDels = snap.deleteEntries.filterNot(e => Manifests.isPosDelete(e.path))
    val eqOk = eqDels.isEmpty || {
      uniqueKeys.nonEmpty && stored.exists { s =>
        val keyFields = uniqueKeys.flatMap(k => s.fields.find(_.name == k))
        keyFields.size == uniqueKeys.size &&
          keyFields.forall(f => IcebergLikeTable.eqDeleteKeyType(f.dataType)) && {
            !snapshotHasEvolution(snap) || {
              val resolve = epochPhysicalNames(snap, keyFields)
              snap.dataEntries.forall(e => resolve(e.path).forall(_.isDefined)) &&
                eqDels.forall(e =>
                  physNamesAt(snap, keyFields, e.deleteSeq).forall(_.isDefined))
            }
          }
      }
    }
    stored match {
      case Some(s) if delsOk && eqOk && snap.entries.forall(_.size >= 0L) =>
        Some((snap, s))
      case _ => None
    }
  }

  /** The manifest entries a condition's planning-time pruning keeps —
    * stats intervals, bloom membership and (hidden-)partition inverse
    * bounds, same machinery as [[readWhere]] — with their stamped
    * size/row-count (the native scan's split planning and statistics).
    */
  private[weblog] def prunedEntries(snap: TableSnapshot,
      condition: Column): Seq[Manifests.FileEntry] = {
    val keep = prunedFiles(snap, storedSchema(snap.meta), condition).toSet
    snap.dataEntries.filter(e => keep(e.path))
  }

  /** The columns planning-time pruning can act on — what the native
    * scan reports as runtime-filterable: the physical partition column
    * (identity layout), every hidden-transform source, and the
    * stats/bloom-stamped columns.
    */
  private[weblog] def prunableColumns: Seq[String] =
    ((if (transform.isEmpty) Seq(partitionCol) else transform.get.sources) ++
      statsCols ++ bloomColumns).distinct

  /** The escaped leaf directory path for a tuple of layout-column
    * values, in `partCols` order (Spark's own partition-path escaping —
    * null/empty → the Hive default name), exactly as partitionBy lays a
    * staging tree out — so leaf membership derived from VALUES can
    * never diverge from the paths the import produced.
    */
  private def leafPathOf(values: Seq[Any]): String =
    partCols.zip(values).map { case (c, v) =>
      val seg =
        if (v == null || String.valueOf(v).isEmpty)
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(String.valueOf(v))
      s"$c=$seg"
    }.mkString("/")

  /** Route a batch per the deployment's T3 metadata: upsert iff keys. */
  def write(batch: DataFrame, orderCol: String): Unit =
    write(batch, orderCol, None)

  /** Routed write carrying the exactly-once replay mark (see
    * [[append]]); the streaming ingest passes its (checkpoint, batchId).
    */
  def write(batch: DataFrame, orderCol: String,
      appendId: Option[(String, Long)]): Unit =
    if (uniqueKeys.isEmpty) append(batch, appendId)
    else upsert(batch, orderCol, appendId)

  /** Row-level DELETE (`DELETE FROM t WHERE condition` — the GDPR
    * "erase this user" operation an Iceberg web-analytics table serves,
    * and the WHEN MATCHED THEN DELETE half of MERGE). The rewrite unit
    * is the FILE: discovery runs over the stats/bloom-pruned candidate
    * files, and only files that actually contain matching rows are
    * rewritten (as their surviving rows), committed as one new
    * snapshot; every other file — including siblings in the same leaf —
    * carries over by reference. A file whose rows all match simply
    * vanishes from the new manifest. Retained
    * historical snapshots still contain the rows — after the retention
    * window ([[vacuum]]) the files are gone, which is exactly Iceberg's
    * GDPR posture (delete + expire_snapshots). Returns the number of
    * rows deleted.
    *
    * The discovery scan is column-pruned to the condition's columns plus
    * the partition columns AND file-skipped by the manifest stats/bloom
    * stamps, so the rewrite cost is bounded by the files that might
    * contain matches — for a key-localized predicate on a stamped
    * column that is a handful of files, never the table.
    */
  def delete(condition: Column): Long =
    withCommitRetry { deleteOnce(condition) }

  /** Per-FILE hit counts for `condition` in one pass over the candidate
    * files: the rewrite unit of [[delete]] and [[replaceWhere]] is the
    * files that actually CONTAIN matches — a survivor file in the same
    * leaf carries over untouched (Iceberg's copy-on-write rewrites
    * matched data files, not whole partitions). The file name is
    * captured ON the scan (before applyDeletes' joins —
    * input_file_name is empty after an exchange), and the hit count
    * runs over MOR-LIVE rows only: a row an equality-delete file
    * already removed must not be re-counted or "re-deleted". Returns
    * (root-relative file path, matching live rows) pairs; result size
    * is O(candidate files), a manifest-scale driver collect.
    */
  private def fileHits(snap: TableSnapshot, condition: Column,
      candidates: Seq[String]): Array[(String, Long)] = {
    val rootUri = root.toUri.getPath.stripSuffix("/")
    applyDeletes(snap,
        readFileSetEvolved(snap, candidates, needsPos(snap))
          .withColumn("_f", input_file_name()))
      .filter(condition)
      .groupBy(col("_f")).agg(count(lit(1)).as("_n"))
      .collect()
      .map { r =>
        val p = new java.net.URI(r.getString(0)).getPath
        p.stripPrefix(rootUri).stripPrefix("/") -> r.getLong(1)
      }
  }

  /** METADATA-ONLY row-level DELETE (Iceberg's partition-scoped
    * delete, r12): when the condition decides WHOLE LEAVES — the same
    * translation the handled-filter machinery uses (identity partition
    * predicates, boundary-aligned half-lines on hidden time/truncate
    * transforms, per-leg predicates on multi specs) — the matching
    * leaves' files simply leave the manifest: zero data I/O, zero
    * tombstones, zero rewrites. Retention and partition-scoped GDPR
    * ("drop day 3", "drop event='debug'") on a 100 TB table are ONE
    * manifest commit, whatever the table's delete mode. None = not
    * metadata-decidable — the caller runs its row-level machinery.
    * Requires stamped row counts (the return contract is rows deleted).
    *
    * Live delete files compose (r13) as long as NO tombstone's leaf is
    * among the dropped leaves: both delete-file kinds are leaf-scoped
    * by construction (equality masks apply under the reader's leaf
    * equality; positional tuples are staged `partitionBy` the layout
    * columns, so a file only ever names data in its own leaf), so a
    * dropped leaf with no tombstone provably holds zero masked rows —
    * its stamped row counts ARE its live row counts — and the carried
    * tombstones keep masking exactly the kept leaves they always did.
    * A tombstone inside a dropped leaf refuses to the row paths: the
    * count would overstate (masked rows re-counted as deleted), and
    * the commit would orphan a delete file whose data is gone.
    */
  private def metadataDeleteOnce(liveVersion: Long, snap: TableSnapshot,
      condition: Column): Option[Long] = {
    if (snap.dataEntries.isEmpty) return None
    val schema = storedSchema(snap.meta).getOrElse(return None)
    // top-level conjuncts translated to the V1 filter grammar the
    // whole-leaf decider consumes; any untranslatable conjunct refuses
    val translated = conditionToFilters(schema, condition).getOrElse(return None)
    val decide = entryDeciderFor(snap, translated).getOrElse(return None)
    // a leaf-constant predicate is TRUE for every row of a file or for
    // none — decided per FILE (r13: on a multi-epoch snapshot each
    // file's own spec governs, so retention slices stay metadata-only
    // DURING a spec migration too): TRUE files drop, FALSE files carry
    // untouched, an undecidable file refuses the whole fast path
    var deleted = 0L
    val dropPaths = scala.collection.mutable.Set.empty[String]
    val dropLeaves = scala.collection.mutable.Set.empty[String]
    snap.dataEntries.foreach { e =>
      decide(e) match {
        case None => return None
        case Some(true) =>
          if (e.rowCount < 0L) return None
          deleted += e.rowCount
          dropPaths += e.path
          dropLeaves += leafOf(e.path)
        case Some(false) =>
      }
    }
    if (dropPaths.isEmpty) return Some(0L)
    // the leaf-scoping soundness gate (r13): any tombstone sharing a
    // leaf with a dropped file means that file's stamped count may
    // include masked rows — refuse to the row-level machinery.
    // Tombstones in untouched leaves carry through and keep masking
    // exactly what they did.
    if (snap.deleteEntries.exists(e => dropLeaves.contains(leafOf(e.path))))
      return None
    val version = nextVersion(liveVersion)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val keep = snap.entries.filterNot(e => dropPaths.contains(e.path))
    // a normal commit: drop the fast-forward ancestry mark; everything
    // else (schema, ids, history, constraints, stats, blooms, hwm)
    // carries — the commit is purely subtractive metadata
    val meta = snap.meta - FfKey +
      (TsKey -> System.currentTimeMillis().toString) +
      (LayoutKey -> layoutSpec)
    publishVersion(version, token, keep, meta, snap)
    expireSnapshots()
    Some(deleted)
  }

  private def deleteOnce(condition: Column): Long = {
    val (liveVersion, snap) = resolveLive()
    val previous = snap.files
    if (previous.isEmpty) return 0L
    metadataDeleteOnce(liveVersion, snap, condition) match {
      case Some(n) => return n
      case None =>
    }
    val schema = storedSchema(snap.meta)
    // the discovery scan composes the table's OWN file skipping: on a
    // stats/bloom-stamped key, a GDPR point delete opens the handful of
    // candidate files whose bounds/filters might contain the key, never
    // the whole snapshot
    val candidates = prunedFiles(snap, schema, condition)
    if (candidates.isEmpty) return 0L
    val hits = fileHits(snap, condition, candidates)
    if (hits.isEmpty) return 0L
    val deleted = hits.map(_._2).sum
    val affectedFiles = hits.map(_._1).toSet
    require(affectedFiles.subsetOf(previous.toSet),
      s"delete discovery resolved files outside the snapshot: " +
        s"${affectedFiles.diff(previous.toSet).take(3).mkString(", ")}")
    // DELETE semantics: remove rows where the condition is TRUE; a NULL
    // condition keeps the row (a bare `!condition` would drop it). The
    // survivor read applies the live equality deletes too — a rewritten
    // file gets a NEW (higher) write sequence, so the old delete files
    // stop applying to it, and their already-deleted rows must not
    // resurrect through the rewrite.
    val survivors = morRead(snap, affectedFiles.toSeq.sorted)
      .filter(!coalesce(condition, lit(false)))
    commit(survivors, liveVersion, snap)(
      _ => previous.filterNot(affectedFiles))
    deleted
  }

  /** Row-level UPDATE (`UPDATE t SET c = v WHERE condition`) — the same
    * copy-on-write file-scoped rewrite as [[delete]]: discovery runs
    * over the stats/bloom-pruned candidate files, only files actually
    * CONTAINING matches are rewritten (matched rows with the
    * assignments applied, unmatched neighbours carried value-identical),
    * everything else carries over by reference in one snapshot commit.
    * NULL-condition rows are untouched (SQL three-valued semantics).
    *
    * Assignments may target any data column — including the hidden
    * partition TRANSFORM's source (rows then migrate leaves: the commit
    * re-derives the partition value) and, on keyed tables, the unique
    * keys (the key bucket is re-derived so the row stays reachable to
    * its merges; colliding an updated key onto an existing one is the
    * caller's responsibility, exactly SQL UPDATE's). The physical
    * partition column of an untransformed table and the internal bucket
    * column are refused. Returns rows updated.
    */
  def update(condition: Column, set: Seq[(String, Column)]): Long =
    withCommitRetry { updateOnce(condition, set) }

  private def updateOnce(condition: Column, set: Seq[(String, Column)]): Long = {
    require(set.nonEmpty, "UPDATE needs at least one assignment")
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta)
    val previous = snap.files
    if (previous.isEmpty) return 0L
    val schema = storedSchema(snap.meta)
    schema.foreach { s =>
      set.foreach { case (c, _) =>
        require(s.fieldNames.contains(c), s"no column '$c' to update")
      }
    }
    set.foreach { case (c, _) =>
      // the derived hidden-partition column is refused even when a
      // transform is declared: commit's withDerivedPartition re-derives
      // it from the source column, so an assignment here would be
      // accepted but silently discarded — update the transform's SOURCE
      // column instead (rows then migrate leaves correctly)
      require(c != bucketCol && c != partitionCol,
        if (transform.isDefined && c == partitionCol)
          s"cannot update derived partition column '$c' — it is " +
            s"re-derived from '${transform.get.sources.mkString(", ")}' " +
            "at commit; update the source column instead"
        else s"cannot update layout column '$c'")
    }
    val candidates = prunedFiles(snap, schema, condition)
    if (candidates.isEmpty) return 0L
    // same one-pass file-hit discovery as deleteOnce: the rewrite unit
    // is files that actually CONTAIN matches
    val hits = fileHits(snap, condition, candidates)
    if (hits.isEmpty) return 0L
    val updated = hits.map(_._2).sum
    val affectedFiles = hits.map(_._1).toSet
    require(affectedFiles.subsetOf(previous.toSet),
      s"update discovery resolved files outside the snapshot: " +
        s"${affectedFiles.diff(previous.toSet).take(3).mkString(", ")}")
    // assignments see the PRE-update row (SQL semantics: all SET
    // expressions evaluate against the old values simultaneously), so
    // the per-column projections are built from the scanned columns in
    // one select, never chained withColumns
    val rows = morRead(snap, affectedFiles.toSeq.sorted)
    val matched = coalesce(condition, lit(false))
    val setMap = set.toMap
    val projected = rows.select(rows.columns.toSeq.map { c =>
      setMap.get(c).fold(col(c))(v =>
        when(matched, v).otherwise(col(c)).as(c))
    }: _*)
    // updated unique keys re-derive the bucket; the commit re-derives a
    // transform's partition value — both layouts stay routable
    val shaped =
      if (uniqueKeys.isEmpty || !set.exists(a => uniqueKeys.contains(a._1)))
        projected
      else withBucket(projected.drop(bucketCol))
    commit(shaped, liveVersion, snap)(
      _ => previous.filterNot(affectedFiles))
    updated
  }

  /** Generic SQL MERGE INTO (`MERGE INTO t USING s ON cond WHEN ...`)
    * — the full clause algebra, not just the keyed upsert+tombstone
    * fast path ([[merge]]): any ON condition, ordered WHEN MATCHED
    * UPDATE/DELETE clauses (each optionally conditional), WHEN NOT
    * MATCHED INSERTs, and WHEN NOT MATCHED BY SOURCE UPDATE/DELETEs —
    * first satisfied clause wins, NULL clause conditions don't match
    * (SQL three-valued), and a target row matching MULTIPLE source
    * rows fails the standard's cardinality check when update/delete
    * clauses exist. Conditions and assignments reference the target as
    * `t` and the source as `s` (`col("t.k") === col("s.k")`).
    *
    * Copy-on-write, candidate-file-scoped like [[update]]/[[delete]]:
    * `candidatePredicate` (a target-only predicate IMPLIED by the ON
    * condition — the SQL bridge derives it from the ON conjuncts
    * automatically) prunes discovery through the manifest stats; the
    * candidate files are rewritten as the merge result in ONE snapshot
    * commit, everything else carries by reference. Without a derivable
    * target-only predicate the candidate set is the table — exactly
    * Iceberg's copy-on-write MERGE posture. Returns (updated, deleted,
    * inserted) row counts.
    *
    * `schemaEvolution = true` is Delta's `autoMerge`: an assigned
    * target column that does not exist yet but DOES exist on the
    * source (same name) is ADDED to the target schema with the
    * source's type — stored rows read NULL for it (the add-column
    * evolution every commit already supports), and the commit stamps
    * the widened schema. With evolution off (default) such
    * assignments are ignored, the SQL MERGE posture.
    */
  def mergeInto(source: DataFrame, on: Column,
      matched: Seq[IcebergLikeTable.MergeWhen] = Nil,
      notMatched: Seq[IcebergLikeTable.MergeInsert] = Nil,
      notMatchedBySource: Seq[IcebergLikeTable.MergeWhen] = Nil,
      candidatePredicate: Option[Column] = None,
      targetSchema: Option[StructType] = None,
      equiKeys: Seq[(String, Column)] = Nil,
      maxDynamicPruneKeys: Int = 1000,
      schemaEvolution: Boolean = false): IcebergLikeTable.MergeIntoResult =
    withCommitRetry {
      mergeIntoOnce(source, on, matched, notMatched, notMatchedBySource,
        candidatePredicate, targetSchema, equiKeys, maxDynamicPruneKeys,
        schemaEvolution)
    }

  private def mergeIntoOnce(source: DataFrame, on: Column,
      matched: Seq[IcebergLikeTable.MergeWhen],
      notMatched: Seq[IcebergLikeTable.MergeInsert],
      notMatchedBySource: Seq[IcebergLikeTable.MergeWhen],
      candidatePredicate: Option[Column],
      targetSchema: Option[StructType],
      equiKeys: Seq[(String, Column)],
      maxDynamicPruneKeys: Int,
      schemaEvolution: Boolean = false): IcebergLikeTable.MergeIntoResult = {
    import IcebergLikeTable.{MergeDelete, MergeInsert, MergeIntoResult, MergeUpdate, MergeWhen}
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "MERGE needs at least one WHEN clause")
    // candidate pruning assumes unscanned target rows carry over
    // UNCHANGED — but a NOT MATCHED BY SOURCE clause acts on exactly
    // the rows pruning would skip, so the two cannot compose
    require(notMatchedBySource.isEmpty ||
      (candidatePredicate.isEmpty && equiKeys.isEmpty),
      "candidate pruning cannot compose with NOT MATCHED BY SOURCE " +
        "clauses (they act on the rows pruning skips)")
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta)
    val previous = snap.files
    val schema = storedSchema(snap.meta)
    // DYNAMIC file pruning (Iceberg's runtime filtering for COW MERGE):
    // for an equi-keyed merge, a BOUNDED distinct-key collect from the
    // source turns into per-column IN predicates — stats/bloom stamps
    // then cut the candidate set to files that can contain the keys. A
    // key set past the cap falls back to the static predicate alone;
    // per-column membership is a superset of the tuple set (sound for
    // discovery, the join still decides matches).
    val dynPredicate: Option[Column] =
      if (equiKeys.isEmpty || previous.isEmpty) None
      else {
        val keyRows = source.select(equiKeys.map(_._2): _*)
          .distinct().limit(maxDynamicPruneKeys + 1).collect()
        if (keyRows.length > maxDynamicPruneKeys) None
        else Some(equiKeys.zipWithIndex.map { case ((tCol, _), i) =>
          val vals = keyRows.map(_.get(i)).filter(_ != null).distinct.toSeq
          if (vals.isEmpty) lit(false) else col(tCol).isin(vals: _*)
        }.reduce(_ && _))
      }
    val pruneWith = (candidatePredicate, dynPredicate) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (a, b) => a.orElse(b)
    }
    val candidates =
      if (previous.isEmpty) Nil
      else pruneWith match {
        case Some(p) => prunedFiles(snap, schema, p)
        case None => snap.dataFiles
      }
    val candidateSet = candidates.toSet
    // an uncommitted target still merges (insert-only CREATE+MERGE):
    // the empty side takes its shape from the stamped schema or the
    // caller's declaration
    val tBase0: DataFrame = schema match {
      case Some(_) => userFacing(morRead(snap, candidates))
      case None =>
        val s0 = targetSchema.getOrElse(throw new IllegalStateException(
          s"MERGE INTO an uncommitted table at $path needs targetSchema"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s0)
    }
    // MERGE SCHEMA EVOLUTION (Delta's autoMerge): an assigned target
    // column that does not exist yet but DOES exist on the source is
    // added — null-typed from the source field — so the clause
    // cascades below treat it like any other column; the commit's
    // add-column machinery stamps the widened schema and historical
    // files read NULL for it.
    val tBase: DataFrame =
      if (!schemaEvolution) tBase0
      else {
        val assigned: Seq[String] =
          (matched ++ notMatchedBySource).collect {
            case MergeUpdate(_, set) => set.map(_._1)
          }.flatten ++ notMatched.flatMap(_.values.map(_._1))
        assigned.distinct.filterNot(tBase0.columns.contains)
          .foldLeft(tBase0) { (df, c) =>
            source.schema.fields.find(_.name == c) match {
              case Some(f) => df.withColumn(c, lit(null).cast(f.dataType))
              case None => df // neither side knows the column: ignored
            }
          }
      }
    val userCols = tBase.columns.toSeq
    val TEx = "_graft_t_exists"; val SEx = "_graft_s_exists"
    val TRid = "_graft_t_rid"
    val t = tBase.withColumn(TEx, lit(true))
      .withColumn(TRid, monotonically_increasing_id()).alias("t")
    val s = source.withColumn(SEx, lit(true)).alias("s")
    val joinType = if (notMatched.nonEmpty) "full_outer" else "left_outer"
    val joined = t.join(s, on, joinType).persist()
    try {
      val tOn = coalesce(col(TEx), lit(false))
      val sOn = coalesce(col(SEx), lit(false))
      // SQL cardinality check: with update/delete clauses, one target
      // row must not match several source rows (non-deterministic
      // result otherwise — the standard and Spark/Delta both refuse)
      if (matched.nonEmpty) {
        val dup = joined.filter(tOn && sOn)
          .groupBy(col(TRid)).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1).limit(1).count()
        require(dup == 0L,
          "MERGE cardinality violation: a target row matched multiple source rows")
      }
      def condOf(c: Option[Column]): Column = coalesce(c.getOrElse(lit(true)), lit(false))
      // first-satisfied-clause cascades, built per column. For the kept
      // row's value: update clauses substitute, delete clauses keep the
      // old value (the row is dropped by the keep flag, same cascade).
      def cascadeValue(clauses: Seq[MergeWhen], c: String): Column =
        clauses.foldRight(col(s"t.$c")) { (cl, els) =>
          cl match {
            case MergeUpdate(cond, set) =>
              val v = set.collectFirst { case (`c`, vc) => vc }.getOrElse(col(s"t.$c"))
              when(condOf(cond), v).otherwise(els)
            case MergeDelete(cond) => when(condOf(cond), col(s"t.$c")).otherwise(els)
          }
        }
      def cascadeKeep(clauses: Seq[MergeWhen]): Column =
        clauses.foldRight(lit(true)) { (cl, els) =>
          cl match {
            case MergeUpdate(cond, _) => when(condOf(cond), lit(true)).otherwise(els)
            case MergeDelete(cond) => when(condOf(cond), lit(false)).otherwise(els)
          }
        }
      def insertValue(c: String): Column =
        notMatched.foldRight(lit(null).cast(tBase.schema(c).dataType): Column) {
          (cl, els) =>
            val v = cl.values.collectFirst { case (`c`, vc) => vc }
              .getOrElse(lit(null).cast(tBase.schema(c).dataType))
            when(condOf(cl.condition), v).otherwise(els)
        }
      def insertKeep: Column =
        notMatched.foldRight(lit(false): Column)((cl, els) =>
          when(condOf(cl.condition), lit(true)).otherwise(els))
      // a clause-touched marker mirrors each cascade (for the stats)
      def cascadeTouched(clauses: Seq[MergeWhen], wantDelete: Boolean): Column =
        clauses.foldRight(lit(false): Column) { (cl, els) =>
          cl match {
            case MergeUpdate(cond, _) =>
              when(condOf(cond), lit(!wantDelete)).otherwise(els)
            case MergeDelete(cond) =>
              when(condOf(cond), lit(wantDelete)).otherwise(els)
          }
        }
      val keep = when(tOn && sOn, cascadeKeep(matched))
        .when(tOn && !sOn, cascadeKeep(notMatchedBySource))
        .otherwise(insertKeep)
      val valueCols = userCols.map { c =>
        when(tOn && sOn, cascadeValue(matched, c))
          .when(tOn && !sOn, cascadeValue(notMatchedBySource, c))
          .otherwise(insertValue(c))
          .as(c)
      }
      val stats = joined.agg(
        sum(when(tOn && sOn && cascadeTouched(matched, wantDelete = false), 1L)
          .when(tOn && !sOn && cascadeTouched(notMatchedBySource, wantDelete = false), 1L)
          .otherwise(0L)).as("u"),
        sum(when(tOn && sOn && cascadeTouched(matched, wantDelete = true), 1L)
          .when(tOn && !sOn && cascadeTouched(notMatchedBySource, wantDelete = true), 1L)
          .otherwise(0L)).as("d"),
        sum(when(!tOn && sOn && insertKeep, 1L).otherwise(0L)).as("i")).head()
      def n(i: Int): Long = if (stats.isNullAt(i)) 0L else stats.getLong(i)
      val insertOnly = matched.isEmpty && notMatchedBySource.isEmpty
      val result0 =
        if (insertOnly)
          // Insert-only MERGE (the "insert if not exists" pattern): no
          // clause can alter a target row, so NOTHING is rewritten —
          // the commit appends only the inserted rows and every
          // previous file carries over by reference (Delta's
          // insert-only merge optimization). This also makes duplicate
          // source matches per target row harmless — legal here, since
          // the SQL cardinality check only applies to update/delete
          // clauses — because matched target rows never flow through
          // the join output at all.
          joined.filter(!tOn && sOn && insertKeep).select(valueCols: _*)
        else if (matched.isEmpty) {
          // WHEN NOT MATCHED BY SOURCE without WHEN MATCHED: matched
          // target rows pass through value-identical, but a target row
          // matching N source rows appears N times in the full join (no
          // cardinality check ran) — keep exactly one copy per target
          // row id. Inserts (null TRid) are exempt from the dedup.
          val TOnF = "_graft_t_on"
          val kept = joined
            .withColumn("_graft_keep", keep).filter(col("_graft_keep"))
            .withColumn(TOnF, tOn)
            .select((valueCols :+ col(TRid) :+ col(TOnF)): _*)
          kept.filter(col(TOnF)).dropDuplicates(TRid)
            .unionByName(kept.filter(!col(TOnF)))
            .drop(TRid, TOnF)
        } else joined
          .withColumn("_graft_keep", keep)
          .filter(col("_graft_keep"))
          .select(valueCols: _*)
      val result = if (uniqueKeys.isEmpty) result0 else withBucket(result0)
      val carryOver: Seq[String] =
        if (insertOnly) previous else previous.filterNot(candidateSet)
      commit(result, liveVersion, snap)(_ => carryOver)
      MergeIntoResult(updated = n(0), deleted = n(1), inserted = n(2))
    } finally joined.unpersist()
  }

  /** Schema evolution: WIDEN a data column's type — a METADATA-ONLY
    * commit (Iceberg's type promotion: `int → bigint`,
    * `float → double`). Historical files keep their narrow physical
    * type; the parquet reader promotes at scan (Spark 4's vectorized
    * reader reads INT32 under a LongType schema natively, filter
    * pushdown included), so no file is touched and time travel still
    * reads every epoch. Stamped min/max bounds stay sound — they
    * compare under the CURRENT schema type and integral/float strings
    * parse widened. Refused for:
    *  - layout/unique-key columns (leaf routing and `xxhash64` key
    *    bucketing hash the binary type — widening would re-route keys);
    *  - bloom-stamped columns (the sidecar filters hashed the OLD
    *    type; a post-widen point lookup would hash the new one and
    *    FALSE-NEGATIVE files that contain the value — silent wrong
    *    results; drop the column from `bloomColumns` and rewrite
    *    first).
    * Returns the new live version.
    */
  def widenColumn(name: String, newType: DataType): Long =
    withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      validateLayout(snap.meta)
      val schema = storedSchema(snap.meta).getOrElse(throw new IllegalStateException(
        s"widenColumn needs a schema-stamped manifest under $path"))
      require(schema.fieldNames.contains(name), s"no column '$name' to widen")
      require(!partCols.contains(name) && !uniqueKeys.contains(name),
        s"cannot widen layout or unique-key column '$name' — key bucketing " +
          "and leaf routing hash the binary type")
      require(!bloomColumns.contains(name),
        s"cannot widen bloom-stamped column '$name': the sidecar filters " +
          "hashed the old type and point lookups would silently miss rows; " +
          "remove it from bloomColumns (and maintain()) first")
      val old = schema(schema.fieldIndex(name)).dataType
      if (old == newType) liveVersion
      else {
        val ok = (old, newType) match {
          case (IntegerType, LongType) => true
          case (FloatType, DoubleType) => true
          case _ => false
        }
        require(ok, s"unsupported type widening $old -> $newType " +
          "(supported: int -> bigint, float -> double)")
        val newSchema = StructType(schema.fields.map(f =>
          if (f.name == name) f.copy(dataType = newType) else f))
        val version = nextVersion(liveVersion)
        val meta = snap.meta - FfKey +
          (SchemaKey -> newSchema.json) +
          (TsKey -> System.currentTimeMillis().toString)
        val lines =
          if (snap.refs.nonEmpty) snap.refs.map(Manifests.RefMark + _)
          else snap.files
        Manifests.write(fs, root, version, lines, meta, chainPrefix)
        expireSnapshots()
        version
      }
    }

  /** Schema evolution: RENAME a data column — a METADATA-ONLY commit
    * (Iceberg's rename): the new schema stamp keeps the column's stable
    * id, so readers match every historical file's physical column BY ID
    * and serve it under the new name; no file is touched, time travel
    * to pre-rename snapshots still shows the old name. Refused until
    * every live data file carries field ids (files from before the id
    * stamp would silently read null — [[maintain]] rewrites them).
    * Layout and unique-key columns cannot rename through this handle
    * (they are constructor identity; redeclare + rewrite instead).
    * Stats/bloom stamps recorded under the old name simply stop pruning
    * (reads stay correct) until the files are rewritten. Returns the
    * new live version.
    */
  def renameColumn(oldName: String, newName: String): Long = withCommitRetry {
    evolveSchema("rename", oldName, Some(newName))
  }

  /** Schema evolution: DROP a data column — metadata-only, like
    * [[renameColumn]]. The data stays in the files but is never read;
    * re-adding the same name later assigns a FRESH column id, so the
    * old values can never resurrect (Iceberg's drop semantics, for
    * free from id matching). Returns the new live version.
    */
  def dropColumn(name: String): Long = withCommitRetry {
    evolveSchema("drop", name, None)
  }

  private def evolveSchema(op: String, name: String,
      renameTo: Option[String]): Long = {
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta)
    val schema = storedSchema(snap.meta).getOrElse(throw new IllegalStateException(
      s"$op needs a schema-stamped manifest under $path"))
    require(schema.fieldNames.contains(name), s"no column '$name' to $op")
    require(!partCols.contains(name), s"cannot $op layout column '$name'")
    require(!uniqueKeys.contains(name),
      s"cannot $op unique-key column '$name' (it is handle identity and " +
        "names the equality-delete tuples); redeclare the table instead")
    renameTo.foreach { n =>
      require(!schema.fieldNames.contains(n), s"column '$n' already exists")
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad column name '$n'")
    }
    val ids = colIdsOf(snap.meta)
    val hist = colHistOf(snap.meta)
    val idsFrom = snap.meta.get(IdsFromKey).flatMap(_.toLongOption)
    val unstamped = idsFrom match {
      case None => snap.dataFiles
      case Some(v0) =>
        snap.dataFiles.filterNot(f => fileVersionOf(f).exists(_ >= v0))
    }
    require(ids.contains(name) && (renameTo.isEmpty || unstamped.isEmpty),
      s"cannot $op '$name': ${unstamped.size} live file(s) predate the " +
        s"column-id stamp and epoch resolution would misread them — run " +
        "maintain(fileThreshold = 0) to rewrite them first")
    val id = ids(name)
    val newSchema = renameTo match {
      case Some(n) => StructType(schema.fields.map(f =>
        if (f.name == name) StructField(n, f.dataType, f.nullable, f.metadata)
        else f))
      case None => StructType(schema.fields.filterNot(_.name == name))
    }
    val newIds = renameTo match {
      case Some(n) => ids - name + (n -> id)
      case None => ids - name
    }
    val version = nextVersion(liveVersion)
    // the id keeps its physical-name history: a rename appends the new
    // name from this version on; a drop appends a null terminator (the
    // released name stays attributed to this dead id, so a later
    // re-add can never bind old files' same-named column)
    val newHist = hist + (id ->
      (hist.getOrElse(id, Seq((0L, Option(name)))) :+
        ((version: Long, renameTo))))
    val meta = snap.meta - FfKey +
      (SchemaKey -> newSchema.json) +
      (ColIdsKey -> idsJson(newIds)) +
      (ColHistKey -> histJson(newHist)) +
      (TsKey -> System.currentTimeMillis().toString)
    // pure metadata: the version manifest re-references every leaf
    // manifest (or legacy file list) untouched
    val lines =
      if (snap.refs.nonEmpty) snap.refs.map(Manifests.RefMark + _)
      else snap.files
    Manifests.write(fs, root, version, lines, meta, chainPrefix)
    expireSnapshots()
    version
  }

  /** MERGE-ON-READ row-level DELETE (Iceberg v2 equality-delete files —
    * the posture the reference's
    * `optimize_rewrite_delete_file_threshold='10'` knob provisions for,
    * `web-analytics-iceberg/README.md:187`): instead of rewriting every
    * data file containing matches (copy-on-write [[delete]]), the
    * commit writes one small EQUALITY-DELETE file per affected leaf
    * holding the unique-key tuples of the matched rows; readers
    * anti-join them at scan ([[applyDeletes]], sequence-scoped so a
    * later upsert can re-insert the key), and [[maintain]] compacts
    * leaves whose delete-file count reaches the reference's threshold.
    *
    * At 100 TB this is THE GDPR shape: a point delete of one user is
    * O(matched keys) tombstone+metadata writes — no data file is
    * rewritten, no matter how many GB of data files contain the rows —
    * at the cost of a broadcast anti-join on reads until compaction.
    * Row-for-row identical to [[delete]]: same survivors, same CDC
    * changelog (IcebergMorDeleteSpec pins both). Returns rows deleted.
    */
  def deleteMergeOnRead(condition: Column): Long =
    withCommitRetry { morDeleteOnce(condition) }

  /** MERGE-ON-READ row-level DELETE via POSITIONAL delete files —
    * Iceberg v2's second delete-file kind, and the one Athena itself
    * writes (the reference's `optimize_rewrite_delete_file_threshold`
    * knob counts POSITION delete files,
    * `web-analytics-iceberg/README.md:187`). The commit stores
    * (data-file path, row ordinal) tuples — row identity by PHYSICAL
    * POSITION, resolved from the parquet reader's own
    * `_metadata.row_index` — one small file per affected leaf; readers
    * drop the named rows with one broadcast anti-join, and
    * [[maintain]] compacts past the threshold exactly like equality
    * deletes.
    *
    * vs [[deleteMergeOnRead]]: needs NO unique keys (append-only /
    * key-less tables get O(matched rows) merge-on-read deletes too),
    * needs no sequence scoping (file names are immutable and
    * version-unique, so a tuple can never bleed onto rewritten data),
    * and the delete file contains NO table data — a GDPR point delete
    * leaves nothing of the user in the tombstone itself. The flip
    * side: tuples name ALL matched rows individually (an equality
    * tuple masks every current-and-future row of a key), so positional
    * files suit predicate deletes, equality files suit key retractions.
    * Row-for-row identical survivors and CDC to copy-on-write
    * [[delete]] (IcebergPosDeleteSpec pins both). Returns rows deleted.
    */
  def deletePositional(condition: Column): Long =
    withCommitRetry { posDeleteOnce(condition) }

  private def posDeleteOnce(condition: Column): Long = {
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta)
    if (snap.dataFiles.isEmpty) return 0L
    // a whole-leaf predicate never needs tombstones: metadata delete
    metadataDeleteOnce(liveVersion, snap, condition) match {
      case Some(n) => return n
      case None =>
    }
    val schema = storedSchema(snap.meta)
    val candidates = prunedFiles(snap, schema, condition)
    if (candidates.isEmpty) return 0L
    val fileC = "_graft_dfile"
    // (file, ordinal) is captured ON the scan (ordinal from the scan
    // attach, file name before any exchange); the match runs over
    // MOR-LIVE rows only — a row an existing delete file already masks
    // must not be re-tombstoned (keeps tuples disjoint across commits).
    // The extraction quotes the ENCODED root ([[rawRootPattern]]) so the
    // stored tuple path is never "" on an encodable root.
    val matched = applyDeletes(snap,
        readFileSetEvolved(snap, candidates, withPos = true)
          .withColumn(fileC,
            regexp_extract(input_file_name(), s"$rawRootPattern/(.*)$$", 1)))
      .filter(condition)
      .select(partCols.map(col) :+ col(fileC).as(PosDelFile) :+
        col(PosCol).as(PosDelPos): _*)
      .persist()
    try {
      val perLeaf = matched.groupBy(partCols.map(col): _*)
        .agg(count(lit(1)).as("_rows"))
        .collect() // O(affected leaves)
      if (perLeaf.isEmpty) return 0L
      val deleted = perLeaf.map(_.getAs[Long]("_rows")).sum
      val version = nextVersion(liveVersion)
      val token = java.util.UUID.randomUUID().toString.take(8)
      val staging = new Path(root.getParent, s".staging_v${version}_$token")
      // one sorted delete file per affected leaf (matched is tiny —
      // the shuffle is O(deleted rows), and sorted tuples give the
      // reader's anti-join locality, Iceberg's sort-order requirement
      // for position deletes)
      matched.repartition(partCols.map(col): _*)
        .sortWithinPartitions(
          (partCols.map(col) :+ col(PosDelFile) :+ col(PosDelPos)): _*)
        .write.mode("overwrite").partitionBy(partCols: _*)
        .option("compression", "snappy").parquet(staging.toString)
      try {
        val imported = Manifests.importStagedTree(fs, staging, root,
          s"v$version-$token", "posdel")
        val rowsByLeaf: Map[String, Long] = perLeaf.map { r =>
          leafPathOf(partCols.map(c => r.getAs[Any](c))) ->
            r.getAs[Long]("_rows")
        }.toMap
        val delEntries = imported.map { case (p, size) =>
          Manifests.FileEntry(p, size, rowsByLeaf.getOrElse(leafOf(p), -1L),
            Map.empty, deleteSeq = version)
        }
        val meta = hwmOf(snap.meta) ++
          snap.meta.get(BranchBaseKey).map(BranchBaseKey -> _) ++
          snap.meta.get(ConstraintsKey).map(ConstraintsKey -> _) ++
          snap.meta.get(SchemaKey).map(SchemaKey -> _) ++
          snap.meta.get(ColIdsKey).map(ColIdsKey -> _) ++
          snap.meta.get(ColHistKey).map(ColHistKey -> _) ++
          snap.meta.get(SpecHistKey).map(SpecHistKey -> _) ++
          snap.meta.get(IdsFromKey).map(IdsFromKey -> _) ++
          snap.meta.get(StatsKey).map(StatsKey -> _) ++
          snap.meta.get(BloomKey).map(BloomKey -> _) +
          (TsKey -> System.currentTimeMillis().toString) +
          (LayoutKey -> layoutSpec)
        try publishVersion(version, token, snap.entries ++ delEntries, meta, snap)
        catch {
          case e: Manifests.CommitConflictException =>
            imported.foreach { case (p, _) =>
              fs.delete(new Path(root, p), false)
            }
            throw e
        }
        expireSnapshots()
        deleted
      } finally fs.delete(staging, true)
    } finally matched.unpersist()
  }

  private def morDeleteOnce(condition: Column): Long = {
    require(uniqueKeys.nonEmpty,
      "merge-on-read delete encodes matched rows by their unique keys; " +
        "key-less tables use copy-on-write delete()")
    require(uniqueKeys.forall(k => !partCols.contains(k)),
      "equality-delete columns must be data columns (partition scoping " +
        "already covers the layout dimension)")
    val (liveVersion, snap) = resolveLive()
    validateLayout(snap.meta)
    if (snap.dataFiles.isEmpty) return 0L
    // a whole-leaf predicate never needs tombstones: metadata delete
    metadataDeleteOnce(liveVersion, snap, condition) match {
      case Some(n) => return n
      case None =>
    }
    val schema = storedSchema(snap.meta)
    // same stats/bloom-pruned discovery as the copy-on-write path, over
    // MOR-LIVE rows (an already-tombstoned row must not be re-counted);
    // the grouped frame is the delete-file content AND the deleted-row
    // count in one pass — O(matched keys), never O(table)
    val candidates = prunedFiles(snap, schema, condition)
    if (candidates.isEmpty) return 0L
    val matched = morRead(snap, candidates)
      .filter(condition)
      .groupBy((partCols ++ uniqueKeys).map(col): _*)
      .agg(count(lit(1)).as("_graft_cnt"))
      .persist()
    try {
      val perLeaf = matched.groupBy(partCols.map(col): _*)
        .agg(sum("_graft_cnt").as("_rows"), count(lit(1)).as("_tuples"))
        .collect() // O(affected leaves)
      if (perLeaf.isEmpty) return 0L
      val deleted = perLeaf.map(_.getAs[Long]("_rows")).sum
      val version = nextVersion(liveVersion)
      val token = java.util.UUID.randomUUID().toString.take(8)
      // stage the key tuples partitioned by the layout columns and
      // import them as eqdel- files beside the data files they mask.
      // ONE delete file per affected leaf (r12 — the positional path
      // always did this): without the repartition, every shuffle
      // partition of the matched frame writes its own sliver per leaf
      // — a handful of tuples fanned out to dozens of tombstone files,
      // each a manifest entry and a reader-side anti-join input. The
      // extra shuffle is O(matched keys), and sorted tuples give the
      // reader's probe locality (Iceberg's delete-file sort order).
      val staging = new Path(root.getParent, s".staging_v${version}_$token")
      matched.drop("_graft_cnt")
        .repartition(partCols.map(col): _*)
        .sortWithinPartitions((partCols ++ uniqueKeys).map(col): _*)
        .write.mode("overwrite").partitionBy(partCols: _*)
        .option("compression", "snappy").parquet(staging.toString)
      try {
        val imported = Manifests.importStagedTree(fs, staging, root,
          s"v$version-$token", "eqdel")
        val tuplesByLeaf: Map[String, Long] = perLeaf.map { r =>
          leafPathOf(partCols.map(c => r.getAs[Any](c))) ->
            r.getAs[Long]("_tuples")
        }.toMap
        val delEntries = imported.map { case (p, size) =>
          Manifests.FileEntry(p, size, tuplesByLeaf.getOrElse(leafOf(p), -1L),
            Map.empty, deleteSeq = version)
        }
        // data files, schema, stats and bloom sidecars are all carried
        // untouched — the commit is purely additive metadata
        val meta = hwmOf(snap.meta) ++
          snap.meta.get(BranchBaseKey).map(BranchBaseKey -> _) ++
          snap.meta.get(ConstraintsKey).map(ConstraintsKey -> _) ++
          snap.meta.get(SchemaKey).map(SchemaKey -> _) ++
          snap.meta.get(ColIdsKey).map(ColIdsKey -> _) ++
          snap.meta.get(ColHistKey).map(ColHistKey -> _) ++
          snap.meta.get(SpecHistKey).map(SpecHistKey -> _) ++
          snap.meta.get(IdsFromKey).map(IdsFromKey -> _) ++
          snap.meta.get(StatsKey).map(StatsKey -> _) ++
          snap.meta.get(BloomKey).map(BloomKey -> _) +
          (TsKey -> System.currentTimeMillis().toString) +
          (LayoutKey -> layoutSpec)
        try publishVersion(version, token, snap.entries ++ delEntries, meta, snap)
        catch {
          case e: Manifests.CommitConflictException =>
            imported.foreach { case (p, _) =>
              fs.delete(new Path(root, p), false)
            }
            throw e
        }
        expireSnapshots()
        deleted
      } finally fs.delete(staging, true)
    } finally matched.unpersist()
  }

  /** C7: small-file maintenance — the reference declares
    * `optimize_rewrite_delete_file_threshold='10'`
    * (`web-analytics-iceberg/README.md:187`) and delegates the rewrite to
    * Athena's OPTIMIZE. Here: leaf partitions whose live-snapshot DATA
    * file count exceeds `fileThreshold` — or whose EQUALITY-DELETE file
    * count reaches `deleteFileThreshold` (the reference's knob: Athena
    * rewrites data files once their positional-delete count passes the
    * threshold) — are rewritten with the deletes APPLIED and committed
    * as a new snapshot (same manifest protocol — concurrent readers are
    * undisturbed); the consumed delete files leave the manifest with
    * the rewrite. Returns the rewritten leaf partition paths. Cost is
    * proportional to the hot leaves, never the table.
    */
  def maintain(fileThreshold: Int = 10, targetFiles: Int = 1,
      deleteFileThreshold: Int = 10): Seq[String] =
    withCommitRetry {
      maintainOnce(fileThreshold, targetFiles, Nil, deleteFileThreshold)
    }

  /** [[maintain]] that also RANGE-CLUSTERS the rewritten leaves on
    * `clusterCols` (Iceberg's rewrite_data_files with a sort order):
    * streaming ingest accumulates small files whose stamped bounds all
    * span the hot value range, and this one maintenance pass both
    * compacts them AND makes the recomputed bounds sharp, so
    * [[readWhere]]/[[toDF]] point lookups prune again. The exchange is
    * the hot leaves' rows only, never the table.
    */
  def maintainClustered(clusterCols: Seq[String], fileThreshold: Int = 10,
      targetFiles: Int = 1, deleteFileThreshold: Int = 10): Seq[String] = {
    require(clusterCols.nonEmpty, "maintainClustered needs cluster columns")
    withCommitRetry {
      maintainOnce(fileThreshold, targetFiles, clusterCols, deleteFileThreshold)
    }
  }

  /** Size-based BINPACK compaction (Iceberg's `rewrite_data_files`
    * binpack / the OPTIMIZE behind the reference's hourly maintenance):
    * in every leaf, files smaller than `minFileBytes` (default 75% of
    * target, Iceberg's own default) are merged into
    * ceil(bytes/target) files — but only where that REDUCES the leaf's
    * file count. All sizing comes from the manifest's stamped byte
    * sizes: the planning pass does zero filesystem listing and zero
    * data I/O, so deciding "nothing to do" on a 100 TB table is one
    * manifest read. Large files are never rewritten (binpack's write
    * amplification bound); merge-on-read deletes are applied to the
    * rewritten rows, and delete files stay live for the untouched
    * files they still mask. Returns the rewritten leaf partitions.
    */
  def maintainBySize(targetFileBytes: Long, minFileBytes: Long = 0L): Seq[String] =
    withCommitRetry { maintainBySizeOnce(targetFileBytes, minFileBytes) }

  /** Z-ORDER rewrite (Delta's `OPTIMIZE ... ZORDER BY`, Iceberg's
    * sort-strategy rewrite with a z-order key): rewrites the table's
    * data files in Morton-code order over `zCols`
    * ([[graft.functions.ZOrder]]), so each file covers a small
    * HYPER-RECTANGLE of the multi-column domain instead of a narrow
    * slice of one column — a point/box predicate on ANY subset of the
    * z-columns then prunes to the covering files through the stamped
    * per-file bounds (declare `zCols` in `statsColumns`). Single-column
    * locality wants [[maintainClustered]] instead.
    *
    * Quantization bounds come from ONE aggregate over the rewritten
    * rows (O(cols) driver state); the z-key is a pure codegen'd
    * expression, computed for the exchange and dropped before the
    * write. Physical partition leaves are preserved (the range
    * exchange keys on (partition, z)); merge-on-read deletes are
    * applied by the rewrite and consumed by the commit, exactly like
    * [[maintain]]. One snapshot commit; time travel keeps the
    * pre-rewrite layout readable. `where` scopes the rewrite to the
    * predicate-implicated leaves ([[maintainWhere]]'s economics: at
    * 100 TB you z-order yesterday's partition, never the table —
    * untouched leaves carry over by reference). Returns the rewritten
    * leaves.
    */
  def maintainZOrder(zCols: Seq[String], targetFiles: Int = 16,
      where: Option[Column] = None): Seq[String] = {
    require(zCols.size >= 2 && zCols.size <= 4,
      "z-order needs 2-4 columns (single-column: maintainClustered)")
    require(targetFiles >= 1, "targetFiles must be >= 1")
    if (!exists) Nil
    else withCommitRetry {
      val (liveVersion, snap) = resolveLive()
      validateLayout(snap.meta)
      val previous = snap.files
      // PARTITION-SCOPED z-order (`where`): only leaves the predicate's
      // pruning implicates are rewritten — the 100 TB usage is
      // "z-order yesterday's partition", never the table; everything
      // else carries over by reference
      val hotLeaves: Set[String] =
        if (previous.isEmpty) Set.empty
        else where match {
          case None => snap.dataFiles.map(leafOf).toSet
          case Some(c) =>
            // the scope predicate must ANALYZE: for a read, falling
            // back to "all files" on an unanalyzable predicate is
            // sound (scanning more is safe) — for an EFFECTFUL
            // maintenance scope a typo'd column would silently widen
            // to a full-table rewrite instead of refusing
            storedSchema(snap.meta).foreach { s =>
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
                .filter(c).queryExecution.assertAnalyzed()
            }
            prunedFiles(snap, storedSchema(snap.meta), c).map(leafOf).toSet
        }
      if (hotLeaves.isEmpty) Nil
      else {
        val hotFiles = snap.dataFiles.filter(f => hotLeaves(leafOf(f)))
        val df = morRead(snap, hotFiles)
        zCols.foreach { c =>
          require(df.columns.contains(c), s"no column '$c' to z-order by")
          val dt = df.schema(df.schema.fieldIndex(c)).dataType
          require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
            s"z-order column '$c' must be numeric, got $dt")
        }
        // one pass for the quantization bounds; all-null columns span 0
        val aggs = zCols.flatMap(c => Seq(
          coalesce(min(col(c)).cast("double"), lit(0.0)),
          coalesce(max(col(c)).cast("double"), lit(0.0))))
        val b = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val bitsPer = math.min(16, 62 / zCols.size)
        val qs = zCols.zipWithIndex.map { case (c, i) =>
          graft.functions.ZOrder.quantize(col(c),
            lit(b.getDouble(2 * i)), lit(b.getDouble(2 * i + 1)), bitsPer)
        }
        val zKey = "_graft_z"
        // `targetFiles` is PER LEAF, like the sibling maintenance APIs
        // (maintainOnce/maintainClustered scale by hot.size): a wide or
        // full-table z-order of many leaves must fan the range exchange
        // out across leaves, not collapse into targetFiles total tasks
        val shaped = df
          .withColumn(zKey, graft.functions.ZOrder.interleave(qs, bitsPer))
          .repartitionByRange(targetFiles * hotLeaves.size,
            (partCols :+ zKey).map(col): _*)
          .sortWithinPartitions((partCols :+ zKey).map(col): _*)
          .drop(zKey)
        commit(shaped, liveVersion, snap)(
          _ => previous.filterNot(f => hotLeaves(leafOf(f))))
        hotLeaves.toSeq.sorted.map(_.stripPrefix(s"$partitionCol="))
      }
    }
  }

  private def maintainBySizeOnce(target: Long, minB: Long): Seq[String] = {
    require(target > 0, "targetFileBytes must be positive")
    val min = if (minB <= 0L) math.max(1L, target * 3 / 4) else minB
    if (!exists) return Nil
    val (liveVersion, snap) = resolveLive()
    val previous = snap.files
    if (previous.isEmpty) return Nil
    // the compaction PLAN comes from stamped sizes alone — no listing,
    // no footer, no task; legacy entries without a size never rewrite
    val plan: Map[String, (Seq[String], Int)] =
      snap.dataEntries.groupBy(e => leafOf(e.path)).flatMap { case (l, es) =>
        val small = es.filter(e => e.size >= 0 && e.size < min)
        if (small.size < 2) None
        else {
          val slices = math.max(1,
            math.ceil(small.map(_.size).sum.toDouble / target).toInt)
          if (slices >= small.size) None // merging would not reduce count
          else Some(l -> ((small.map(_.path).sorted, slices)))
        }
      }
    if (plan.isEmpty) return Nil
    val smallFiles = plan.values.flatMap(_._1).toSeq.sorted
    val smallSet = smallFiles.toSet
    val totalSlices = plan.values.map(_._2).sum
    // per-leaf slice counts ride a map literal; the leaf is recovered
    // from the file path ON the scan via fileLeafExpr, which yields the
    // URL-ENCODED segment (input_file_name is a URI) — so the map keys
    // must be encoded the same way or element_at misses for partition
    // values with encodable characters and the leaf degrades to one
    // slice (layout regression, not data loss)
    def rawLeaf(l: String): String =
      new java.net.URI(null, null, "/" + l, null).getRawPath.stripPrefix("/")
    val kByLeaf = typedLit(plan.map { case (l, (_, k)) => rawLeaf(l) -> k })
    val df = morRead(snap, smallFiles)
    val dataCols = df.columns.filterNot(partCols.contains)
    val sliceSrc: Seq[Column] =
      if (dataCols.isEmpty) Seq(lit(0L)) else dataCols.toSeq.map(col)
    val shaped = df
      .withColumn("_graft_k", element_at(kByLeaf, fileLeafExpr))
      .withColumn("_graft_slice",
        pmod(xxhash64(sliceSrc: _*), col("_graft_k").cast("long")))
      .repartition(totalSlices,
        (partCols :+ "_graft_slice").map(col): _*)
      .drop("_graft_k", "_graft_slice")
    commit(shaped, liveVersion, snap)(_ => previous.filterNot(smallSet))
    plan.keys.toSeq.sorted.map(_.stripPrefix(s"$partitionCol="))
  }

  /** PARTITION-SCOPED maintenance (Athena's `OPTIMIZE ... WHERE` /
    * Iceberg's rewrite_data_files with a filter): compact ONLY the
    * leaves holding files the predicate's pruning implicates — at
    * 100 TB the maintenance job for "yesterday's partitions" touches
    * yesterday, not the table. Discovery is the same manifest-stats
    * pruning reads use (no listing, no data I/O to plan); implicated
    * leaves are rewritten whole (deletes applied, tombstones consumed)
    * in one snapshot commit. Returns the rewritten leaf partitions.
    */
  def maintainWhere(condition: Column, targetFiles: Int = 1): Seq[String] =
    withCommitRetry {
      if (!exists) Nil
      else {
        val (liveVersion, snap) = resolveLive()
        val previous = snap.files
        if (previous.isEmpty) Nil
        else {
          val hot = prunedFiles(snap, storedSchema(snap.meta), condition)
            .map(leafOf).distinct.sorted
          if (hot.isEmpty) Nil
          else {
            val hotSet = hot.toSet
            val hotFiles = snap.dataFiles.filter(f => hotSet.contains(leafOf(f)))
            val shaped = morRead(snap, hotFiles)
              .repartition(math.max(1, targetFiles * hot.size), partCols.map(col): _*)
            commit(shaped, liveVersion, snap)(
              _ => previous.filterNot(f => hotSet.contains(leafOf(f))))
            hot.map(_.stripPrefix(s"$partitionCol="))
          }
        }
      }
    }

  private def maintainOnce(fileThreshold: Int, targetFiles: Int,
      clusterCols: Seq[String], deleteFileThreshold: Int): Seq[String] = {
    if (!exists) return Nil
    val (liveVersion, snap) = resolveLive()
    val previous = snap.files
    if (previous.isEmpty) return Nil
    val dataByLeaf = snap.dataFiles.groupBy(leafOf)
    val delByLeaf = snap.deleteEntries.map(_.path).groupBy(leafOf)
    val hot = (dataByLeaf.keySet ++ delByLeaf.keySet).filter { l =>
      dataByLeaf.getOrElse(l, Nil).size > fileThreshold ||
        delByLeaf.getOrElse(l, Nil).size >= deleteFileThreshold
    }.toSeq.sorted
    if (hot.isEmpty) return Nil
    val hotSet = hot.toSet
    val hotFiles = snap.dataFiles.filter(f => hotSet.contains(leafOf(f)))
    // the rewrite READS with the hot leaves' equality deletes applied
    // and the commit DROPS those leaves' delete files (carry-over is
    // leaf-scoped) — compaction consumes the tombstones, exactly
    // Iceberg's rewrite_data_files + rewrite_position_delete_files
    val hotDf = morRead(snap, hotFiles)
    val shaped =
      if (clusterCols.isEmpty)
        hotDf.repartition(targetFiles * hot.size, partCols.map(col): _*)
      else hotDf
        .repartitionByRange(targetFiles * hot.size,
          (partCols ++ clusterCols).map(col): _*)
        .sortWithinPartitions((partCols ++ clusterCols).map(col): _*)
    commit(shaped, liveVersion, snap)(
      _ => previous.filterNot(f => hotSet.contains(leafOf(f))))
    hot.map(_.stripPrefix(s"$partitionCol="))
  }
}

object IcebergLikeTable {

  /** Positional-delete tuple budget for the NATIVE scan: tuples beyond
    * this read through the V1 bridge instead of a driver collect +
    * broadcast. 4M tuples ≈ a few hundred MB broadcast at worst — the
    * same order as the keepers union-find cap.
    */
  private[weblog] val NativePosDeleteTupleBudget = 4000000L

  /** Byte twin of the tuple budget: total stamped (compressed) delete
    * file bytes the native scan will collect and broadcast. 128 MB
    * compressed key tuples decode to the high hundreds of MB — the
    * same order as the tuple cap's worst case; past it, the V1
    * bridge's distributed anti-join serves the snapshot.
    */
  private[weblog] val NativeDeleteBytesBudget = 128L << 20

  /** Key-column types the native scan's EQUALITY-delete mask admits:
    * the membership test is UnsafeRow byte equality, so only types
    * whose equal values are byte-identical in an UnsafeRow qualify.
    * Float/double are excluded (NaN bit patterns vary and 0.0/-0.0
    * compare equal but differ bytewise — exactly why joins normalize
    * them); such keys read through the V1 bridge's null-safe anti-join.
    */
  private[weblog] def eqDeleteKeyType(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.BooleanType |
         org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _ => false
  }

  /** Name prefix of ANALYZE-written Bloom sidecars: they cover a
    * whole-table snapshot (not one commit's imports), so the commit
    * path's name-tag liveness rule doesn't apply — they carry until
    * the next analyze supersedes them.
    */
  private[weblog] val AnalyzeBloomPrefix = "_graft_bloom_analyze_"

  /** One LEG of a partition spec as the aggregate pushdown sees it —
    * what a grouping expression / COUNT(DISTINCT) column may resolve
    * against (see [[IcebergLikeTable.AggView.legs]]):
    *  - [[AggLeg.IdentityPhys]]: the physical partition column of an
    *    untransformed layout (the leaf value IS the rows' value);
    *  - [[AggLeg.IdentityData]]: an identity leg of a multi(...) spec
    *    over a data column (leaf leg value = the column's string
    *    rendering);
    *  - [[AggLeg.Time]]: a days()/hours() leg (leaf leg value = the UTC
    *    ordinal — groupable through CAST(src AS DATE) and constant
    *    datetime extracts);
    *  - [[AggLeg.Opaque]]: a truncate leg — present so indices align,
    *    never groupable (one leaf holds a RANGE of source values).
    */
  private[graft] sealed trait AggLeg
  private[graft] object AggLeg {
    final case class IdentityPhys(field: org.apache.spark.sql.types.StructField)
        extends AggLeg
    final case class IdentityData(field: org.apache.spark.sql.types.StructField)
        extends AggLeg
    final case class Time(source: String, hoursLeg: Boolean) extends AggLeg
    /** A calendar-width time leg — months() (yearsLeg = false) or
      * years() (yearsLeg = true). Leaf value = the Iceberg ordinal.
      * Unlike [[Time]], `CAST(src AS DATE)` is NOT constant over a
      * leaf (a month holds ~30 dates), so only the calendar extracts
      * that ARE constant ([[IcebergLikeTable.calLeafExtract]]) group.
      */
    final case class CalTime(source: String, yearsLeg: Boolean) extends AggLeg
    case object Opaque extends AggLeg
  }

  /** The UTC mapping from a time leg's LEAF ORDINAL to a datetime
    * EXTRACT field's value, when that field is CONSTANT over the leaf's
    * whole time interval — the condition under which a pushed
    * `GROUP BY extract(field FROM src)` is answerable from the
    * manifest. Date parts (year/month/day/quarter/week/day-of-week/
    * day-of-year) are constant over a days() leaf; those plus HOUR over
    * an hours() leaf. MINUTE/SECOND vary within every leaf and never
    * qualify. None = not answerable.
    */
  private[graft] def leafExtract(hoursLeg: Boolean,
      field: String): Option[Long => Int] = {
    def dateParts(epochDay: Long => Long): Option[Long => Int] = {
      def ld(o: Long) = java.time.LocalDate.ofEpochDay(epochDay(o))
      field match {
        case "YEAR" => Some(o => ld(o).getYear)
        case "MONTH" => Some(o => ld(o).getMonthValue)
        case "DAY" => Some(o => ld(o).getDayOfMonth)
        case "QUARTER" => Some(o => (ld(o).getMonthValue - 1) / 3 + 1)
        case "DAY_OF_YEAR" => Some(o => ld(o).getDayOfYear)
        // the V2 Extract semantic is ISO (1 = Monday … 7 = Sunday);
        // Spark's dayofweek()/weekday() push their own arithmetic ON
        // TOP of this raw extract ((x % 7) + 1 / x - 1), which the
        // caller composes
        case "DAY_OF_WEEK" => Some(o => ld(o).getDayOfWeek.getValue)
        // Spark's weekofyear / year-of-week: ISO-8601 week-based
        case "WEEK" => Some(o => ld(o).get(
          java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear()))
        case "YEAR_OF_WEEK" => Some(o => ld(o).get(
          java.time.temporal.WeekFields.ISO.weekBasedYear()))
        case _ => None
      }
    }
    if (!hoursLeg) dateParts(identity)
    else if (field == "HOUR") Some(o => java.lang.Math.floorMod(o, 24L).toInt)
    else dateParts(o => java.lang.Math.floorDiv(o, 24L))
  }

  /** [[leafExtract]]'s calendar-width twin (r13): the extract fields
    * CONSTANT over a months()/years() leaf, mapped from the Iceberg
    * ordinal by pure arithmetic — YEAR/MONTH/QUARTER over a month
    * leaf, YEAR alone over a year leaf (everything finer varies
    * within the leaf and scans for real).
    */
  private[graft] def calLeafExtract(yearsLeg: Boolean,
      field: String): Option[Long => Int] =
    if (yearsLeg) field match {
      case "YEAR" => Some(o => java.lang.Math.toIntExact(1970L + o))
      case _ => None
    } else field match {
      case "YEAR" => Some(o =>
        java.lang.Math.toIntExact(1970L + java.lang.Math.floorDiv(o, 12L)))
      case "MONTH" => Some(o => java.lang.Math.floorMod(o, 12L).toInt + 1)
      case "QUARTER" => Some(o => java.lang.Math.floorMod(o, 12L).toInt / 3 + 1)
      case _ => None
    }

  /** SQL THREE-VALUED predicate over an identity leg's raw rendering
    * (Some(true/false) = decided, None = SQL NULL — the caller keeps a
    * leaf iff the result IS TRUE, exactly a row filter's semantics):
    * every row of a leaf shares the leg value, so these decide whole
    * leaves exactly. Literal types are restricted to renderings that
    * round-trip the leg encoding (strings verbatim; integrals and
    * booleans via their canonical decimal/true-false rendering — the
    * same `cast(col AS STRING)` the writer derived). None (outer) =
    * the filter shape/type is not exactly translatable.
    */
  private[weblog] def identityLegPredicate(
      f: org.apache.spark.sql.sources.Filter, source: String)
      : Option[Option[String] => Option[Boolean]] = {
    import org.apache.spark.sql.sources
    def render(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long | _: java.lang.Boolean => Some(String.valueOf(v))
      // dates render as the ISO local date — exactly `cast(d AS STRING)`
      // (both the legacy and Java-8 literal encodings Spark pushes)
      case d: java.sql.Date => Some(d.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }
    def kleene(a: Option[Boolean], b: Option[Boolean],
        and: Boolean): Option[Boolean] = (a, b) match {
      case (Some(x), Some(y)) => Some(if (and) x && y else x || y)
      // one side NULL: false&&NULL = false, true||NULL = true; the
      // dominant value survives, anything else stays NULL
      case (Some(x), None) => if (x == and) None else Some(x)
      case (None, Some(y)) => if (y == and) None else Some(y)
      case (None, None) => None
    }
    def tv(f: sources.Filter): Option[Option[String] => Option[Boolean]] =
      f match {
        case sources.EqualTo(a, v) if a == source && v != null =>
          render(v).map(s => lv => lv.map(_ == s))
        case sources.EqualNullSafe(a, null) if a == source =>
          Some(lv => Some(lv.isEmpty))
        case sources.EqualNullSafe(a, v) if a == source =>
          render(v).map(s => lv => Some(lv.contains(s)))
        case sources.In(a, vs) if a == source && vs.nonEmpty =>
          val hasNull = vs.contains(null)
          val rendered = vs.toSeq.filter(_ != null).map(render)
          if (rendered.exists(_.isEmpty)) None
          else {
            val set = rendered.flatten.toSet
            Some {
              case None => None // NULL IN (...) is NULL
              case Some(x) if set.contains(x) => Some(true)
              case Some(_) => if (hasNull) None else Some(false)
            }
          }
        case sources.IsNull(a) if a == source => Some(lv => Some(lv.isEmpty))
        case sources.IsNotNull(a) if a == source =>
          Some(lv => Some(lv.isDefined))
        // LIKE shapes on a string leg: every row equals the leg value,
        // so prefix/suffix/containment decide whole leaves exactly
        case sources.StringStartsWith(a, p) if a == source =>
          Some(lv => lv.map(_.startsWith(p)))
        case sources.StringEndsWith(a, p) if a == source =>
          Some(lv => lv.map(_.endsWith(p)))
        case sources.StringContains(a, p) if a == source =>
          Some(lv => lv.map(_.contains(p)))
        case sources.Not(c) => tv(c).map(p => lv => p(lv).map(!_))
        case sources.And(l, r) =>
          for { a <- tv(l); b <- tv(r) }
            yield (lv: Option[String]) => kleene(a(lv), b(lv), and = true)
        case sources.Or(l, r) =>
          for { a <- tv(l); b <- tv(r) }
            yield (lv: Option[String]) => kleene(a(lv), b(lv), and = false)
        case sources.AlwaysTrue() => Some(_ => Some(true))
        case sources.AlwaysFalse() => Some(_ => Some(false))
        case _ => None
      }
    tv(f)
  }

  /** lgConfigK of the per-file NDV sketches (DataSketches HLL): 12 ⇒
    * ~1.6% standard error, a few hundred bytes compact-serialized for
    * typical file cardinalities. Unions at ANY lgK ≤ this merge
    * losslessly, so the constant can only ever be lowered.
    */
  private[weblog] val NdvSketchLgK = 12

  /** One imported file's commit-time metadata (the one-pass aggregate
    * over the just-written batch): row count, column [min, max] string
    * bounds, Bloom filters, and the r11 per-column null counts and
    * base64 HLL distinct sketches.
    */
  private[weblog] final case class ImportedMeta(rows: Long,
      bounds: Map[String, (String, String)],
      blooms: Map[String, Array[Byte]],
      nulls: Map[String, Long],
      ndv: Map[String, String],
      sums: Map[String, String])

  /** The exact-decimal accumulator type for a column's per-file SUM
    * stamp: 38-digit decimal at the column's own scale. None = the
    * type is never sum-stamped — floating point (order-dependent
    * addition: Spark's own answer varies run to run, so a stamped
    * "exact" sum would be a lie) and non-numerics.
    */
  /** Extract a column's SUM stamp from a stats-pass row: the `_sm_`
    * string when present; "0" when the column is all-null in the file
    * (SQL SUM ignores nulls — the reader decides 0-vs-NULL from the
    * null counts); None for an un-aggregated type, a row without the
    * column, or a per-file decimal overflow (refusal).
    */
  private[weblog] def sumStamp(r: org.apache.spark.sql.Row, c: String,
      nulls: Long, rowCount: Long): Option[String] = {
    if (!r.schema.fieldNames.contains(s"_sm_$c")) return None
    Option(r.getAs[String](s"_sm_$c")) match {
      case Some(v) => Some(v)
      case None if nulls == rowCount => Some("0")
      case None => None // non-null values summed to NULL: overflow
    }
  }

  private[weblog] def sumCastType(
      dt: org.apache.spark.sql.types.DataType):
      Option[org.apache.spark.sql.types.DecimalType] = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType =>
      Some(org.apache.spark.sql.types.DecimalType(38, 0))
    case d: org.apache.spark.sql.types.DecimalType =>
      Some(org.apache.spark.sql.types.DecimalType(38, d.scale))
    case _ => None
  }

  /** A WHEN MATCHED / WHEN NOT MATCHED BY SOURCE clause of
    * [[IcebergLikeTable.mergeInto]]; clause order is evaluation order
    * (first satisfied wins), a None condition always matches.
    * Conditions/values reference the target as `t.` and the source as
    * `s.` qualified columns.
    */
  sealed trait MergeWhen
  final case class MergeUpdate(condition: Option[Column],
      set: Seq[(String, Column)]) extends MergeWhen
  final case class MergeDelete(condition: Option[Column]) extends MergeWhen

  /** A WHEN NOT MATCHED THEN INSERT clause; unnamed target columns
    * insert NULL.
    */
  final case class MergeInsert(condition: Option[Column],
      values: Seq[(String, Column)])

  /** Row counts of a [[IcebergLikeTable.mergeInto]] commit. */
  final case class MergeIntoResult(updated: Long, deleted: Long, inserted: Long)

  /** A resolved table snapshot: the version manifest's metadata plus
    * the file entries expanded from its referenced leaf manifests
    * ([[Manifests.LeafPrefix]] — the sharded, Iceberg-style
    * manifest-list layout) or, for legacy monolithic manifests, parsed
    * from the raw file lines with stats recovered from the old `stats`
    * meta key.
    */
  private[weblog] final case class TableSnapshot(
      entries: Seq[Manifests.FileEntry],
      meta: Map[String, String],
      refs: Seq[String]) {
    /** EVERY referenced path — data AND equality-delete files. This is
      * the GC / carry-over surface: retention liveness and leaf-scoped
      * commit carry-over must span both kinds.
      */
    def files: Seq[String] = entries.map(_.path)
    /** The readable data files (what a scan opens). */
    def dataEntries: Seq[Manifests.FileEntry] = entries.filterNot(_.isDelete)
    def dataFiles: Seq[String] = dataEntries.map(_.path)
    /** The live equality-delete files readers must anti-join. */
    def deleteEntries: Seq[Manifests.FileEntry] = entries.filter(_.isDelete)
    lazy val entryOf: Map[String, Manifests.FileEntry] =
      entries.map(e => e.path -> e).toMap
    lazy val statsOf: FileStats.Stats =
      entries.filter(_.stats.nonEmpty).map(e => e.path -> e.stats).toMap
    /** The smallest parseable write version across the live data
      * files; None when any file's name is foreign/legacy (version
      * unknowable). Computed once per snapshot — the collapse-invariant
      * verification in [[governingTransform]] consults it on every
      * metadata decision, and re-parsing 10⁵ file names per call would
      * tax exactly the zero-task paths it protects.
      */
    lazy val minDataFileVersion: Option[Long] = {
      val vs = dataFiles.map { f =>
        val name = f.substring(f.lastIndexOf('/') + 1)
        "^part-v(\\d+)-".r.findFirstMatchIn(name).flatMap(_.group(1).toLongOption)
      }
      if (vs.isEmpty) Some(Long.MaxValue)
      else if (vs.exists(_.isEmpty)) None
      else Some(vs.flatten.min)
    }
  }
}
