package graft.weblog

import java.util.OptionalLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** NATIVE DataSource-V2 batch scan over a graft snapshot — the read
  * path that closes the two plan-quality gaps the V1 bridge cannot
  * (V1ScanWrapper forwards neither interface):
  *
  *  - '''Plan-time statistics''' ([[SupportsReportStatistics]]): the
  *    INITIAL plan sees manifest-resolved bytes/rows for the PRUNED
  *    file set, so a small (or well-filtered) graft table picks the
  *    broadcast build side before AQE ever runs — what Athena/Trino
  *    get from table statistics.
  *  - '''Runtime (join-driven) file pruning'''
  *    ([[SupportsRuntimeV2Filtering]]): dynamic partition pruning
  *    routes the join's build-side key set back into this scan as IN
  *    predicates, and `filter(...)` re-runs the manifest stats/bloom/
  *    hidden-partition pruning with them — Trino's dynamic filtering
  *    (the engine behind the reference's Athena workgroup,
  *    `web-analytics-parquet/cdk_stacks/athena_workgroup.py:46-47`):
  *    `events JOIN dims ON events.day = dims.day WHERE dims.x = …`
  *    opens only the fact files whose bounds can hold the dim's
  *    surviving keys, never the partition's full file set.
  *
  * The data path is Spark's own vectorized parquet reader
  * ([[ParquetPartitionReaderFactory]]) over manifest-resolved
  * [[FilePartition]]s: zero directory listings, stamped sizes drive
  * the split planning, and pushed filters reach the row-group stats.
  * Eligibility is decided per snapshot by
  * [[IcebergLikeTable.nativeScanSnapshot]] (schema/size-stamped;
  * rename/drop epochs, positional deletes and equality deletes all
  * read natively — including eq deletes UNDER rename epochs, r12: the
  * mask's key columns resolve per epoch — see the MOR state below);
  * ineligible snapshots (over-budget or unstamped delete tuples,
  * non-canonical key types, a key column some epoch cannot resolve)
  * fall back to the V1 bridge, which
  * composes the full merge-on-read and column-history machinery. Every pushed filter is declared
  * residual, so Spark re-applies them row-by-row — pruning here is an
  * I/O-only optimization, exactly like the rest of the engine.
  */
final class GraftNativeScan private (
    spark: SparkSession,
    table: IcebergLikeTable,
    snap: IcebergLikeTable.TableSnapshot,
    required: StructType,
    pushedCond: Column,
    handledFilters: Array[sources.Filter],
    pushedFilters: Array[sources.Filter],
    limit: Option[Int]) extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  import GraftNativeScan._

  /** Runtime predicates arrive AFTER planning via [[filter]]; the
    * re-plan ([[planInputPartitions]]) sees pushed AND runtime
    * conditions (the DSv2 contract: filter() mutates the scan, then
    * toBatch is asked for partitions again).
    */
  @volatile private var runtimeCond: Option[Column] = None

  /** MERGE-ON-READ state of this snapshot (r11 — previously all three
    * fell back to the V1 bridge and lost stats/pruning/pushdown exactly
    * on the tables using the most advanced features):
    *  - rename/drop epochs read through PER-EPOCH reader schemas
    *    positionally aligned with the current logical schema;
    *  - positional delete files apply as a per-reader (file, ordinal)
    *    skip over the scan-generated row index;
    *  - equality delete files apply as a per-reader SEQUENCE-SCOPED
    *    key-tuple mask: the tuples collect once at planning (stamped
    *    counts fit the broadcast budget — eligibility), and each data
    *    file's reader drops rows whose key tuple appears in a delete
    *    generation YOUNGER than the file's own write sequence —
    *    Iceberg v2 semantics, row-identical to the V1 bridge's
    *    broadcast anti-join (the delete side is always the broadcast
    *    side there too, so this trades a per-generation join for a
    *    hash-set probe inside the scan).
    */
  private val hasEvo = table.snapshotHasEvolution(snap)
  private val posDelEntries =
    snap.deleteEntries.filter(e => Manifests.isPosDelete(e.path))
  private val eqDelEntries =
    snap.deleteEntries.filterNot(e => Manifests.isPosDelete(e.path))
  private val hasPosDels = posDelEntries.nonEmpty
  private val hasEqDels = eqDelEntries.nonEmpty
  private def morMode: Boolean = hasEvo || hasPosDels || hasEqDels

  // reader output = data columns then partition-directory columns
  // (Spark reorders to the expected output with a projection)
  private val partFields =
    table.partCols.flatMap(c => required.fields.find(_.name == c))
  private val dataFields =
    required.fields.filterNot(f => table.partCols.contains(f.name)).toSeq
  private val readDataSchema = StructType(dataFields)
  private val readPartSchema = StructType(partFields)

  override def readSchema(): StructType =
    StructType(dataFields ++ partFields)

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftNativeScan ${table.path} [${readSchema().fieldNames.mkString(", ")}]"

  private def condition: Column =
    runtimeCond.fold(pushedCond)(pushedCond && _)

  /** Superset pruning (stats/bloom/partition intervals) for the full
    * condition, then the EXACT whole-leaf restriction for the HANDLED
    * filters — the scan promised Spark it applies those row for row:
    * identity partition predicates decide per leaf because every row
    * of a leaf shares its partition values; day-aligned half-lines on
    * a days() source decide per leaf because a leaf holds exactly one
    * UTC day of instants.
    */
  private lazy val exactKeeper:
      Option[Seq[Manifests.FileEntry] => Seq[Manifests.FileEntry]] =
    if (handledFilters.isEmpty) None
    else Some(table.exactEntriesKeeper(snap, handledFilters.toSeq))

  private def prunedExact(cond: Column): Seq[Manifests.FileEntry] = {
    val entries = table.prunedEntries(snap, cond)
    exactKeeper.fold(entries)(k => k(entries))
  }

  private def prunedNow(): Seq[Manifests.FileEntry] = {
    val entries = prunedExact(condition)
    limit match {
      // pushed LIMIT (only offered filter-free / handled-only): keep
      // files until the stamped row counts cover it — whole files,
      // Spark's own limit operator trims the excess. Any unstamped
      // count disables the cut (the cover would be a guess). Live
      // delete files compose when leaf-scoping allows (r13): a file in
      // a tombstone-FREE leaf carries exact live counts, so when those
      // files alone cover the limit, the cut keeps a prefix of THEM
      // (LIMIT without ORDER BY delivers any n rows); if the unmasked
      // files cannot cover it, the cut stands down entirely.
      case Some(n) if entries.forall(_.rowCount >= 0L) =>
        val unmasked =
          if (!hasPosDels && !hasEqDels) Some(entries)
          else {
            val delLeaves =
              snap.deleteEntries.map(e => table.leafOf(e.path)).toSet
            val free =
              entries.filter(e => !delLeaves.contains(table.leafOf(e.path)))
            // masked files would starve the cover: cut only when the
            // unmasked files alone can deliver n rows
            if (free.map(_.rowCount).sum >= n) Some(free) else None
          }
        unmasked.fold(entries) { es =>
          var acc = 0L
          es.takeWhile { e =>
            val need = acc < n; acc += e.rowCount; need
          }
        }
      case _ => entries
    }
  }

  /** Typed partition values of a leaf (identity layout), matching
    * [[readPartSchema]]; the factory only admits string/int/long
    * partition column types.
    */
  private def partitionValuesOf(leaf: String): InternalRow = {
    val bySegment = leaf.split("/").filter(_.nonEmpty).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i < 0) None
      else Some(seg.take(i) ->
        ExternalCatalogUtils.unescapePathName(seg.drop(i + 1)))
    }.toMap
    InternalRow.fromSeq(readPartSchema.fields.toSeq.map { f =>
      bySegment.get(f.name) match {
        case None | Some(ExternalCatalogUtils.DEFAULT_PARTITION_NAME) => null
        case Some(raw) => f.dataType match {
          case StringType => UTF8String.fromString(raw)
          case IntegerType => raw.toInt
          case LongType => raw.toLong
          case other => throw new IllegalStateException(
            s"unsupported partition type $other for ${f.name}")
        }
      }
    })
  }

  /** KEY-GROUPED planning (storage-partitioned joins): when the table
    * is keyed and the session opted into V2 bucketing, partitions are
    * grouped ONE PER KEY BUCKET (every leaf of that `gbucket` across
    * all partition values — a key always hashes to one bucket, so all
    * rows of a join key live in exactly one input partition) and the
    * scan reports `bucket(numBuckets, keys)` partitioning. Two
    * co-bucketed graft tables joined on their keys then skip the
    * shuffle entirely; the grouping engages only under the explicit
    * conf. Live EQUALITY deletes keep key grouping (masking only
    * removes rows, never moves a key across buckets — the per-file
    * readers apply the mask in place), rename EPOCHS keep it too
    * (r12: bucket hashing is key-value-based and keys are
    * rename-immutable; each single-file partition carries its epoch so
    * the reader resolves physical names), and POSITIONAL deletes keep
    * it as well (r13: a skip list names (file, ordinal) tuples — it
    * can only ever REMOVE rows of the one file it addresses, never
    * move a key across buckets; each single-file partition carries its
    * file's relative path so the reader resolves its skip list, the
    * same composition argument that admitted the other two).
    */
  /** The scan's BUCKET LAYOUT, when one governs: (join-key columns,
    * bucket count, leaf→bucket parser). Three shapes qualify:
    *  - the KEYED upsert layout (`gbucket=` leaves hashed over
    *    uniqueKeys) — the original SPJ path;
    *  - a hidden `bucket(n, col)` partition transform (r14) governing
    *    EVERY live file (single-epoch; a mid-spec-migration snapshot
    *    refuses — old-epoch leaves decode under a different spec, so
    *    grouping them by the current hash would mis-co-locate keys);
    *  - a `multi(...)` spec with exactly ONE bucket leg (r14) — the
    *    canonical Iceberg fact layout `(days(ts), bucket(n, key))`:
    *    grouping decomposes the composite leaf and keys on the bucket
    *    leg's value.
    * All hash with the same xxhash64(seed 42) the FunctionCatalog's
    * `bucket(n, keys...)` evaluates, so the reported
    * KeyGroupedPartitioning is sound on every layout (and they
    * co-locate with EACH OTHER at equal counts).
    */
  private lazy val bucketLayout: Option[(Seq[String], Int, String => Option[Int])] =
    if (table.uniqueKeys.nonEmpty)
      Some((table.uniqueKeys, table.numBuckets, (rel: String) =>
        table.leafOf(rel).split('/')
          .find(_.startsWith(s"${table.bucketCol}="))
          .flatMap(_.substring(table.bucketCol.length + 1).toIntOption)))
    else {
      def rawLeafValue(rel: String): Option[String] =
        table.leafOf(rel).split('/')
          .find(_.startsWith(s"${table.partitionCol}="))
          .map(_.substring(table.partitionCol.length + 1))
          .filter(_ != ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
          .map(ExternalCatalogUtils.unescapePathName)
      def bucketId(n: Int)(v: String): Option[Int] =
        v.toIntOption.filter(b => b >= 0 && b < n)
      table.governingTransform(snap) match {
        case Some(Some(PartitionTransforms.Bucket(src, n))) =>
          Some((Seq(src), n, (rel: String) =>
            rawLeafValue(rel).flatMap(bucketId(n))))
        // the CANONICAL Iceberg fact layout (r14):
        // `PARTITIONED BY (days(ts), bucket(n, key))` — a multi spec
        // with exactly ONE bucket leg key-groups by that leg's value
        // decomposed from the composite leaf (a key always hashes to
        // one bucket whatever its day), so the table keeps time
        // pruning AND shuffle-free key joins at once. A NullToken leg
        // (null keys in that leaf) refuses — grouping null-key rows
        // under a real bucket would mis-co-locate outer joins.
        case Some(Some(m: PartitionTransforms.Multi)) =>
          val bucketLegs = m.legs.zipWithIndex.collect {
            case (b: PartitionTransforms.Bucket, i) => (b, i)
          }
          bucketLegs match {
            case Seq((b, idx)) =>
              Some((Seq(b.source), b.numBuckets, (rel: String) =>
                rawLeafValue(rel).flatMap { v =>
                  val parts = v.split(
                    java.util.regex.Pattern.quote(PartitionTransforms.Multi.Sep), -1)
                  if (parts.length != m.legs.size) None
                  else Option(parts(idx))
                    .filter(_ != PartitionTransforms.Multi.NullToken)
                    .flatMap(bucketId(b.numBuckets))
                }))
            case _ => None
          }
        case _ => None
      }
    }

  private def bucketGrouping: Boolean =
    bucketLayout.exists { case (keys, _, _) =>
      SQLConf.get.getConfString(
        "spark.sql.sources.v2.bucketing.enabled", "false") == "true" &&
        keys.forall(readSchema().fieldNames.contains)
    }

  /** The bucket id of a leaf path under the governing layout. */
  private def bucketOf(relFile: String): Option[Int] =
    bucketLayout.flatMap(_._3(relFile))

  /** Bucket ids present under the STATIC (pushed-only) pruning,
    * ascending — None turns key grouping OFF for this scan:
    *  - any static file without a parseable `gbucket=` leaf (a
    *    foreign/legacy file on a keyed table): grouping it under an
    *    invented key would silently mis-co-locate join rows, so the
    *    scan reports UnknownPartitioning and Spark shuffles as usual;
    *  - an empty static set (nothing to group).
    * Computed ONCE from the PRE-runtime-filter set and reused by the
    * post-filter() re-plan: runtime filtering may empty a bucket but
    * must never shrink the partitioning Spark already planned around
    * (BatchScanExec refuses a scan whose key groups change during
    * runtime filtering), so a runtime-pruned bucket planes as an EMPTY
    * input partition instead of disappearing.
    */
  private lazy val staticBuckets: Option[Seq[Int]] =
    if (!bucketGrouping) None
    else {
      val buckets = prunedExact(pushedCond).map(e => bucketOf(e.path))
      if (buckets.isEmpty || buckets.exists(_.isEmpty)) None
      else Some(buckets.flatten.distinct.sorted)
    }

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    (staticBuckets, bucketLayout) match {
      case (Some(buckets), Some((keys, n, _))) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
            n, keys: _*)),
          buckets.size)
      case _ => new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
    }

  /** Distinct schema EPOCHS of this snapshot's data files, indexed
    * stably (from the FULL data-file set, so a runtime re-plan and the
    * reader factory always agree on indices). One epoch — the identity
    * mapping — for never-evolved snapshots. Epochs resolve the pruned
    * data columns PLUS — under live equality deletes — the key columns
    * the query did not project ([[extraKeyFields]]): two epochs that
    * agree on the data columns but renamed an unprojected key column
    * must stay distinct, or a reader would probe the mask under the
    * wrong physical key name (r12 — eq deletes compose with renames).
    */
  private lazy val storedFields: StructType =
    table.storedSchema(snap.meta).getOrElse(
      throw new IllegalStateException(
        s"native scan planned over an unstamped schema at ${table.path}"))

  /** Key columns the query projected away — the equality mask still
    * needs them in the read row; the reader reads them as extra
    * trailing columns and the wrapper projects them back out.
    */
  private lazy val extraKeyFields: Seq[StructField] =
    if (!hasEqDels) Nil
    else table.uniqueKeys.filterNot(k => dataFields.exists(_.name == k))
      .map(k => storedFields.fields.find(_.name == k).getOrElse(
        throw new IllegalStateException(
          s"unique key '$k' missing from the stored schema at ${table.path}")))

  private lazy val epochFields: Seq[StructField] = dataFields ++ extraKeyFields

  private lazy val epochResolve: String => Seq[Option[String]] =
    table.epochPhysicalNames(snap, epochFields)

  private lazy val epochKeys: IndexedSeq[Seq[Option[String]]] =
    snap.dataEntries.map(e => epochResolve(e.path)).distinct.toIndexedSeq

  private def epochIndexOf(relPath: String): Int = {
    val i = epochKeys.indexOf(epochResolve(relPath))
    if (i < 0) throw new IllegalStateException(
      s"file $relPath resolves to an unknown schema epoch under ${table.path}")
    i
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val entries = prunedNow()
    recordPrune(table.path, entries.size, runtimeCond.isDefined)
    val conf = SQLConf.get
    val openCost = conf.filesOpenCostInBytes
    val minPartitionNum = conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism)
    val totalBytes = entries.map(_.size + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, minPartitionNum)
    val maxSplitBytes = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, bytesPerCore))
    val root = table.path.stripSuffix("/")
    def filesOf(es: Seq[Manifests.FileEntry], split: Long): Seq[PartitionedFile] =
      es.flatMap { e =>
        val values = partitionValuesOf(table.leafOf(e.path))
        val abs = SparkPath.fromPathString(s"$root/${e.path}")
        (0L until math.max(1L, e.size) by split).map { off =>
          PartitionedFile(values, abs, off,
            math.min(split, e.size - off), Array.empty, 0L, e.size)
        }
      }
    // the equality-delete generations whose tuples may mask a file's
    // rows: same leaf, delete sequence STRICTLY above the file's write
    // sequence (Iceberg v2 scoping). An unparseable write sequence
    // (foreign import) applies none — exactly the V1 anti-join, where
    // the NULL sequence fails every `seq < dseq` comparison and the
    // row survives.
    lazy val eqGens: Seq[(String, Long)] =
      eqDelEntries.map(e => (table.leafOf(e.path), e.deleteSeq)).distinct
    def eqKeysFor(e: Manifests.FileEntry): Seq[(String, Long)] =
      if (!hasEqDels) Nil
      else table.fileVersionOf(e.path) match {
        case Some(fseq) =>
          val leaf = table.leafOf(e.path)
          eqGens.filter(g => g._1 == leaf && g._2 > fseq)
        case None => Nil
      }
    if (morMode && staticBuckets.isEmpty) {
      // EPOCH-PURE partitions (each reads under its epoch's physical
      // schema); under live delete files additionally SINGLE-SPLIT
      // partitions, so the reader knows which data file its (file,
      // ordinal) skip list addresses / which equality-delete
      // generations out-sequence it.
      return entries.groupBy(e => epochIndexOf(e.path)).toSeq.sortBy(_._1)
        .flatMap { case (epoch, es) =>
          if (hasPosDels || hasEqDels)
            es.sortBy(_.path).flatMap { e =>
              filesOf(Seq(e), maxSplitBytes).map(pf =>
                GraftMorPartition(epoch, Some(e.path), eqKeysFor(e),
                  FilePartition(0, Array(pf))))
            }
          else
            FilePartition.getFilePartitions(spark,
              filesOf(es, maxSplitBytes), maxSplitBytes)
              .map(fp => GraftMorPartition(epoch, None, Nil, fp))
        }.toArray[InputPartition]
    }
    staticBuckets match {
      case Some(buckets) =>
        // one unsplit partition PER FILE, stamped with its bucket key —
        // BatchScanExec groups same-key partitions into one task for
        // the plain storage-partitioned join, and per-file granularity
        // lets Spark's partially-clustered distribution split a skewed
        // side across tasks instead of being stuck at one-task-per-
        // bucket. Buckets the runtime filter (or the limit cut) emptied
        // still plan one zero-file partition, so the key-group set
        // never changes under Spark's feet. Entries here are a subset
        // of the static set (pruning only ever removes files as
        // conjuncts are added), so every bucket parses. Live EQUALITY
        // deletes keep the grouping (r11): masking only ever REMOVES
        // rows, and a key's surviving rows still live in exactly its
        // bucket — so co-bucketed GDPR tables join shuffle-free even
        // with tombstones in flight; each per-file partition carries
        // its out-sequencing generations for the reader's mask.
        val byBucket = entries.groupBy(e => bucketOf(e.path).getOrElse(
          throw new IllegalStateException(
            s"file without a parseable bucket leaf survived " +
              s"runtime pruning but not static pruning under ${table.path}")))
        var i = -1
        buckets.flatMap { bucket =>
          val es = byBucket.getOrElse(bucket, Nil)
          if (es.isEmpty) {
            i += 1
            Seq(GraftBucketedPartition(bucket, 0, None, Nil,
              FilePartition(i, Array.empty)): InputPartition)
          } else es.map { e =>
            i += 1
            // each single-file partition carries its schema EPOCH (r12:
            // key grouping composes with rename epochs — a renamed
            // keyed table keeps its shuffle-free joins; bucket hashing
            // is key-value-based, and keys are rename-immutable) and —
            // under live positional deletes — its file's relative path,
            // so the reader resolves the (file, ordinal) skip list
            // (r13: SPJ composes with positional tombstones too)
            GraftBucketedPartition(bucket, epochIndexOf(e.path),
              if (hasPosDels) Some(e.path) else None, eqKeysFor(e),
              FilePartition(i, filesOf(Seq(e), Long.MaxValue).toArray))
              : InputPartition
          }
        }.toArray
      case None =>
        FilePartition.getFilePartitions(spark, filesOf(entries, maxSplitBytes),
          maxSplitBytes).toArray[InputPartition]
    }
  }

  /** One parquet reader factory for one READ SCHEMA: its own hadoop
    * configuration (the requested-schema keys Spark's own ParquetScan
    * stamps — the row reader resolves them; timezone + binary/int96
    * semantics for both readers — without these the parquet-mr path
    * NPEs and timestamps could shift) and its own broadcast.
    */
  private def parquetFactory(epochSchema: StructType,
      epochFilters: Array[sources.Filter]): ParquetPartitionReaderFactory = {
    val sqlConf = SQLConf.get
    val hadoopConf = spark.sessionState.newHadoopConf()
    val schemaJson = epochSchema.json
    hadoopConf.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    hadoopConf.set("org.apache.spark.sql.parquet.row.requested_schema", schemaJson)
    hadoopConf.set("org.apache.spark.sql.parquet.row.attributes", schemaJson)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key,
      sqlConf.sessionLocalTimeZone)
    hadoopConf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key,
      sqlConf.caseSensitiveAnalysis)
    hadoopConf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hadoopConf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hadoopConf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    hadoopConf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    hadoopConf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlConf.parquetFieldIdReadEnabled)
    val bc: Broadcast[SerializableConfiguration] =
      spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    ParquetPartitionReaderFactory(
      sqlConf,
      bc,
      epochSchema,
      epochSchema,
      readPartSchema,
      epochFilters,
      None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the never-evolved, delete-free snapshot (the overwhelmingly
    // common case) keeps the single-factory plan, bit for bit.
    // Pushed filters reach the row-group stats — but ONLY those whose
    // columns survive column pruning (r12): a HANDLED filter on a
    // pruned-away DATA column (a multi-spec identity/time leg the
    // query filters on but never projects) must not reach the parquet
    // reader, which would evaluate it against the projected schema —
    // absent column ⇒ NULL ⇒ every row dropped. Handled filters are
    // leaf-exact anyway (every surviving file's rows all match), so
    // their row-group pruning adds nothing; residual filters always
    // reference projected columns (Spark keeps their columns alive).
    // The MOR path below gets this for free: per-epoch translation
    // drops filters whose columns the epoch schema lacks.
    if (!morMode)
      return new GraftUnwrappingReaderFactory(
        parquetFactory(readDataSchema, pushedFilters.filter(
          _.references.forall(readDataSchema.fieldNames.contains))))
    // PER-EPOCH factories: each epoch reads under its physical column
    // names, positionally aligned with the current logical schema (an
    // absent column — the file predates it, or its physical twin
    // belongs to a dead id — reads a name no footer can contain and
    // null-fills). Pushed filters are renamed into each epoch so the
    // row-group stats still prune; a filter whose column the epoch
    // lacks is dropped THERE (residual — Spark re-applies them all).
    // nullable: the column is absent from every footer (the readers
    // GENERATE it — ParquetRowIndexUtil matches the reserved name);
    // a required-but-missing column would fail the vectorized reader's
    // schema check before the generator ever ran
    // EQUALITY-delete masking needs the key columns in the read row
    // even when the query projected them away: the reader reads them
    // as EXTRA trailing columns and the wrapper projects them back out
    // (each epoch reads them under ITS OWN physical names — epochs are
    // keyed on dataFields ++ extraKeyFields, so a renamed key column
    // splits the epochs even when the data columns agree)
    val rowIdxField = StructField(GraftNativeScan.RowIndexCol, LongType)
    val factories = epochKeys.map { phys =>
      val fields = epochFields.zip(phys).zipWithIndex.map {
        case ((f, Some(p)), _) => StructField(p, f.dataType, f.nullable, f.metadata)
        case ((f, None), i) => StructField(s"__graft_absent_$i", f.dataType)
      }
      val renames = dataFields.map(_.name).zip(phys).toMap
      val epochFilters = pushedFilters.flatMap(
        translateFilter(_, n => renames.getOrElse(n, None), exact = false))
      parquetFactory(
        StructType(if (hasPosDels) fields :+ rowIdxField else fields),
        epochFilters)
    }.toArray
    // positional-delete skip lists: (relative file, sorted ordinals),
    // collected once at planning and broadcast — the same bounded
    // posture as the V1 path's broadcast anti-join (eligibility caps
    // the stamped tuple count)
    val deleted: Broadcast[Map[String, Array[Long]]] =
      if (!hasPosDels) null
      else {
        val tuples = spark.read.parquet(
          posDelEntries.map(e => s"${table.path}/${e.path}"): _*)
          .select(table.PosDelFile, table.PosDelPos)
          .collect()
        spark.sparkContext.broadcast(
          tuples.groupBy(_.getString(0)).map { case (f, rs) =>
            f -> rs.map(_.getLong(1)).sorted
          })
      }
    // equality-delete key tuples per (leaf, delete sequence), collected
    // once at planning under the CURRENT schema's key types (a widened
    // key column promotes an old delete file's narrow values exactly
    // like the data files' scan does) and broadcast as canonical
    // UnsafeRows — the reader's membership probe is byte equality.
    // r12: a delete file stores its key columns under the names of ITS
    // OWN write epoch (the manifest's deleteSeq) — files group by that
    // resolution and each group reads under its physical names, so a
    // GDPR table that later renames a key keeps the native path.
    val eqTuples: Broadcast[Map[(String, Long), Array[
        org.apache.spark.sql.catalyst.expressions.UnsafeRow]]] =
      if (!hasEqDels) null
      else {
        val keySchema = StructType(table.uniqueKeys.map(k =>
          storedFields.fields.find(_.name == k).get))
        val byRel: Seq[(String, (String, Long))] = eqDelEntries.map(e =>
          e.path -> ((table.leafOf(e.path), e.deleteSeq)))
        val byPhys = eqDelEntries.groupBy(e =>
          table.physNamesAt(snap, keySchema.fields.toSeq, e.deleteSeq))
        val raw: Array[org.apache.spark.sql.Row] =
          byPhys.toSeq.sortBy(_._2.head.path).flatMap { case (phys, es) =>
            val physSchema = StructType(keySchema.fields.toSeq.zip(phys).map {
              case (f, p) => StructField(
                p.getOrElse(throw new IllegalStateException(
                  s"equality-delete key '${f.name}' unresolvable at its " +
                    s"write epoch under ${table.path}")),
                f.dataType, f.nullable, f.metadata)
            })
            spark.read.schema(physSchema)
              .parquet(es.map(e => s"${table.path}/${e.path}"): _*)
              .select(physSchema.fieldNames.toIndexedSeq.map(col) :+
                org.apache.spark.sql.functions.input_file_name().as("_graft_eqf"): _*)
              .collect().toSeq
          }.toArray
        val toRow = CatalystTypeConverters.createToCatalystConverter(keySchema)
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(keySchema)
        val grouped = raw.groupBy { r =>
          // input_file_name is the percent-encoded URI; decode and match
          // the manifest's relative path by suffix (relative paths carry
          // the full fixed-depth leaf, so no two can suffix-collide)
          val dec = new java.net.URI(r.getString(keySchema.size)).getPath
          byRel.find { case (rel, _) => dec.endsWith(s"/$rel") }
            .getOrElse(throw new IllegalStateException(
              s"equality-delete tuple from unrecognized file $dec " +
                s"under ${table.path}"))._2
        }.map { case (k, rs) =>
          k -> rs.map { r =>
            proj(toRow(org.apache.spark.sql.Row.fromSeq(
              r.toSeq.dropRight(1))).asInstanceOf[InternalRow]).copy()
          }
        }
        spark.sparkContext.broadcast(grouped)
      }
    val nData = dataFields.size
    val nExtra = extraKeyFields.size
    val rowIdxOrdinal = if (hasPosDels) nData + nExtra else -1
    val fullFields = (dataFields ++ extraKeyFields) ++
      (if (hasPosDels) Seq(rowIdxField) else Nil) ++ partFields
    // project the helper columns (extras + row index) back out so the
    // wrapper's output is exactly the schema Spark planned around
    val dropOrdinals = ((nData until nData + nExtra) ++
      (if (hasPosDels) Seq(nData + nExtra) else Nil)).toArray
    val keyOrdinals: Array[Int] =
      if (!hasEqDels) Array.empty
      else table.uniqueKeys.map(k => fullFields.indexWhere(_.name == k)).toArray
    new GraftMorReaderFactory(factories, rowIdxOrdinal,
      StructType(fullFields), dropOrdinals, keyOrdinals, deleted, eqTuples)
  }

  /** Statistics of the PRUNED file set — manifest sums, zero I/O.
    * Unknown row counts (legacy entries) report size only.
    */
  override def estimateStatistics(): Statistics = {
    val entries = prunedNow()
    val bytes = math.max(1L, entries.map(e => math.max(0L, e.size)).sum)
    val rows =
      // live delete files of either kind make the exact row count a
      // data question (how many tuples hit) — report size only
      if (!hasPosDels && !hasEqDels && entries.forall(_.rowCount >= 0L))
        OptionalLong.of(entries.map(_.rowCount).sum)
      else OptionalLong.empty()
    val colStats = columnStatsOf(entries)
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = rows
      override def columnStats(): java.util.Map[NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }

  /** Memo of the last computed column statistics, keyed by the pruned
    * set's file paths: Spark may ask estimateStatistics more than once
    * per planning (and runtime filtering re-plans), and the sketch
    * unions need not repeat for an unchanged set.
    */
  @volatile private var colStatsMemo: Option[(Seq[String],
    java.util.Map[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics])] = None

  /** Per-column V2 statistics of the PRUNED file set (r11): NULL counts
    * sum exactly; distinct counts union the per-file DataSketches-HLL
    * stamps — so with CBO on, join-output cardinality estimates (and
    * therefore downstream broadcast decisions) see real NDV at plan
    * time, zero data I/O. A column unstamped in ANY pruned entry is
    * omitted (refusal, never a guess).
    *
    * Live delete files of either kind demote, not erase (r13): the
    * stamped [min, max] stays EXACT-or-wider — deletion can only ever
    * shrink a column's true range, never widen it, and Spark's CBO
    * treats ranges as bounds — so GDPR tables with tombstones in
    * flight keep their range statistics. NDV and null counts are only
    * UPPER bounds under masking; the V2 ColumnStatistics contract has
    * no bound flag and an overstated NDV can flip a join-cardinality
    * estimate the wrong way (underestimating output), so both are
    * withheld — UNLESS the masked-row fraction is provably tiny
    * (r14): every live tombstone row is stamped in the manifest (a
    * positional tuple masks exactly one row; an equality tuple masks
    * at most one row on a keyed table, whose upsert protocol keeps
    * keys unique), so when
    * `Σ tombstone rows / Σ pruned data rows ≤ 1%` the NDV/null-count
    * overestimate is bounded by 1% of rows — BELOW the HLL sketch's
    * own ~1.6% relative standard error at the stamped lgK. A bound as
    * tight as the sketch's noise floor is a strictly better CBO input
    * than nothing; above the ε the withhold stands, and an unstamped
    * tombstone row count withholds too (refusal, never a guess).
    * r12: decoded sketches come from the JVM-wide immutable-file cache
    * ([[GraftNativeScan.decodedSketch]]) and the whole result memoizes
    * per pruned set — planning the same snapshot twice decodes nothing.
    */
  private def columnStatsOf(entries: Seq[Manifests.FileEntry]):
      java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val key = entries.map(_.path)
    colStatsMemo match {
      case Some((k, res)) if k == key => return res
      case _ =>
    }
    val out = new java.util.HashMap[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    if (entries.isEmpty) return out
    // masked-row fraction of the PRUNED set: tombstones on leaves the
    // prune dropped cannot mask these rows, so only intersecting-leaf
    // delete files count. -1 (unstamped) anywhere ⇒ treat as fully
    // masked (withhold).
    val maskedFraction: Double =
      if (!hasPosDels && !hasEqDels) 0.0
      else {
        val keptLeaves = entries.map(e => table.leafOf(e.path)).toSet
        val dels = snap.deleteEntries
          .filter(e => keptLeaves.contains(table.leafOf(e.path)))
        val dataRows = entries.map(_.rowCount).sum
        if (dels.exists(_.rowCount < 0L) || entries.exists(_.rowCount < 0L) ||
            dataRows <= 0L) 1.0
        else dels.map(_.rowCount).sum.toDouble / dataRows.toDouble
      }
    val masked = maskedFraction > GraftNativeScan.NdvMaskEpsilon
    readSchema().fields.foreach { f =>
      val c = f.name
      val counted = !masked &&
        entries.forall(e => e.nulls.contains(c) && e.ndv.contains(c))
      try {
        val countStats: Option[(Long, Long)] =
          if (!counted) None
          else {
            val nullsSum = entries.map(_.nulls(c)).sum
            val union = new org.apache.datasketches.hll.Union(
              IcebergLikeTable.NdvSketchLgK)
            entries.foreach { e =>
              union.update(GraftNativeScan.decodedSketch(
                table.path, e.path, c, e.ndv(c)))
            }
            Some((math.max(0L, math.round(union.getEstimate)), nullsSum))
          }
        // exact-or-wider column [min, max] from the stamped per-file
        // bounds (catalyst-typed) — without a range the CBO's equi-join
        // estimator can misjudge key overlap; only stamped-everywhere
        // columns contribute (refusal, never a guess)
        val range: Option[(Any, Any)] =
          if (!entries.forall(_.stats.contains(c))) None
          else {
            val cmp = GraftNativeScan.boundOrdering(f.dataType)
            val typed = GraftNativeScan.typedBound(f.dataType) _
            for {
              ord <- cmp
              lo = entries.map(_.stats(c)._1).reduce(
                (a, b) => if (ord(a, b) <= 0) a else b)
              hi = entries.map(_.stats(c)._2).reduce(
                (a, b) => if (ord(a, b) >= 0) a else b)
              tl <- typed(lo); th <- typed(hi)
            } yield (tl, th)
          }
        if (countStats.nonEmpty || range.nonEmpty)
          out.put(org.apache.spark.sql.connector.expressions.Expressions.column(c),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount(): OptionalLong =
                countStats.map(s => OptionalLong.of(s._1))
                  .getOrElse(OptionalLong.empty())
              override def nullCount(): OptionalLong =
                countStats.map(s => OptionalLong.of(s._2))
                  .getOrElse(OptionalLong.empty())
              override def min(): java.util.Optional[Object] =
                range.map(r => java.util.Optional.of(r._1.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty[Object]())
              override def max(): java.util.Optional[Object] =
                range.map(r => java.util.Optional.of(r._2.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty[Object]())
            })
      } catch {
        // a malformed stamp contributes nothing — statistics are
        // advisory, refusal is always sound
        case scala.util.control.NonFatal(_) => out.remove(
          org.apache.spark.sql.connector.expressions.Expressions.column(c))
      }
    }
    colStatsMemo = Some((key, out))
    out
  }

  /** The join keys dynamic pruning may route back: every column the
    * manifest machinery can act on that survives column pruning
    * (Spark resolves these against the relation OUTPUT).
    */
  override def filterAttributes(): Array[NamedReference] = {
    val out = readSchema().fieldNames.toSet
    table.prunableColumns.filter(out.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  }

  override def filter(predicates: Array[V2Predicate]): Unit = {
    val cols = predicates.flatMap(predicateColumn)
    if (cols.nonEmpty)
      runtimeCond = Some(cols.reduce(_ && _))
  }
}

/** A key-grouped input partition: one file of one bucket, stamped with
  * the bucket id as its partition key — what
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * groups storage-partitioned joins by. `eqKeys` carries the
  * equality-delete generations that out-sequence the file (empty on
  * delete-free snapshots) and `relFile` the file's relative path when
  * a positional skip list may address it (None otherwise), so SPJ
  * composes with live tombstones of both kinds.
  */
private[weblog] final case class GraftBucketedPartition(bucket: Int,
    epoch: Int, relFile: Option[String], eqKeys: Seq[(String, Long)],
    inner: FilePartition)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** An epoch-tagged input partition of the MERGE-ON-READ native scan:
  * its files all share one schema epoch (read under that epoch's
  * physical names), and — when delete files are live — all belong to
  * ONE data file (`relFile`), so the reader knows which (file,
  * ordinal) skip list applies and which equality-delete generations
  * (`eqKeys` — the (leaf, delete-sequence) pairs that out-sequence the
  * file) may mask its rows.
  */
private[weblog] final case class GraftMorPartition(epoch: Int,
    relFile: Option[String], eqKeys: Seq[(String, Long)],
    inner: FilePartition) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Dispatches each [[GraftMorPartition]] to its epoch's parquet
  * factory; under live delete files wraps the row reader to skip
  * positionally-deleted ordinals and/or equality-masked key tuples,
  * and to project the helper columns (scan-generated row index,
  * query-unrequested key columns) back out. Columnar reads stay
  * enabled for evolution-only snapshots (each epoch factory reads its
  * own schema); deletes force the row path — the snapshots are
  * transient by design (maintain() compacts delete files at the
  * threshold).
  */
private[weblog] final class GraftMorReaderFactory(
    factories: Array[ParquetPartitionReaderFactory],
    rowIdxOrdinal: Int,
    fullSchema: StructType,
    dropOrdinals: Array[Int],
    keyOrdinals: Array[Int],
    deleted: Broadcast[Map[String, Array[Long]]],
    eqTuples: Broadcast[Map[(String, Long), Array[
      org.apache.spark.sql.catalyst.expressions.UnsafeRow]]])
    extends PartitionReaderFactory {

  private def unwrap(p: InputPartition):
      (ParquetPartitionReaderFactory, Option[String], Seq[(String, Long)],
        InputPartition) =
    p match {
      case GraftMorPartition(e, rel, eqKeys, inner) =>
        (factories(e), rel, eqKeys, inner)
      // the storage-partitioned-join shape: each single-file partition
      // reads under its own schema epoch; live tombstones of both
      // kinds ride along (r13: the partition carries its file's path
      // so the positional skip list resolves exactly as in MOR mode)
      case GraftBucketedPartition(_, epoch, rel, eqKeys, inner) =>
        (factories(epoch), rel, eqKeys, inner)
      case other => (factories.head, None, Nil, other)
    }

  override def createReader(p: InputPartition):
      org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val (f, rel, eqKeys, inner) = unwrap(p)
    val base = f.createReader(inner)
    if (rowIdxOrdinal < 0 && keyOrdinals.isEmpty && dropOrdinals.isEmpty)
      return base
    val skip =
      if (rowIdxOrdinal < 0) Array.emptyLongArray
      else rel.flatMap(deleted.value.get).getOrElse(Array.emptyLongArray)
    // union the applicable generations' tuples once per reader — the
    // probe inside next() is then a single hash-set lookup per row
    val eqSet: java.util.HashSet[
        org.apache.spark.sql.catalyst.expressions.UnsafeRow] =
      if (keyOrdinals.isEmpty || eqKeys.isEmpty) null
      else {
        val s = new java.util.HashSet[
          org.apache.spark.sql.catalyst.expressions.UnsafeRow]()
        eqKeys.foreach(k =>
          eqTuples.value.getOrElse(k, Array.empty).foreach(s.add))
        if (s.isEmpty) null else s
      }
    new MorFilteringReader(base, fullSchema, dropOrdinals, rowIdxOrdinal,
      skip, keyOrdinals, eqSet)
  }

  override def createColumnarReader(p: InputPartition):
      org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val (f, _, _, inner) = unwrap(p)
    f.createColumnarReader(inner)
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    rowIdxOrdinal < 0 && keyOrdinals.isEmpty && dropOrdinals.isEmpty && {
      val (f, _, _, inner) = unwrap(p)
      f.supportColumnarReads(inner)
    }
}

/** Row-path MERGE-ON-READ filter: skips the rows a positional-delete
  * skip list names (binary search over the sorted ordinals — the
  * scan-generated row index is absolute within the data file, so
  * splits compose) and the rows whose key tuple an out-sequencing
  * equality-delete generation masks (byte-canonical UnsafeRow
  * membership probe — null keys compose null-safely, a null is one
  * fixed bit pattern), then projects the helper columns back out.
  */
private[weblog] final class MorFilteringReader(
    base: org.apache.spark.sql.connector.read.PartitionReader[InternalRow],
    fullSchema: StructType,
    dropOrdinals: Array[Int],
    rowIdxOrdinal: Int,
    deletedOrdinals: Array[Long],
    keyOrdinals: Array[Int],
    eqSet: java.util.HashSet[
      org.apache.spark.sql.catalyst.expressions.UnsafeRow])
    extends org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {

  private val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
    .toAttributes(fullSchema)
  private val dropSet = dropOrdinals.toSet
  private val projection = org.apache.spark.sql.catalyst.expressions
    .UnsafeProjection.create(
      attrs.zipWithIndex.collect { case (a, i) if !dropSet(i) => a }, attrs)
  private val keyProjection =
    if (eqSet == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(keyOrdinals.toIndexedSeq.map(attrs(_)), attrs)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (base.next()) {
      val r = base.get()
      val posDeleted = rowIdxOrdinal >= 0 &&
        java.util.Arrays.binarySearch(deletedOrdinals,
          r.getLong(rowIdxOrdinal)) >= 0
      if (!posDeleted && (eqSet == null || !eqSet.contains(keyProjection(r)))) {
        current = r
        return true
      }
    }
    false
  }

  override def get(): InternalRow = projection(current)

  override def close(): Unit = base.close()
}

/** Delegates to the parquet reader factory, unwrapping
  * [[GraftBucketedPartition]] down to its [[FilePartition]].
  */
private[weblog] final class GraftUnwrappingReaderFactory(
    base: ParquetPartitionReaderFactory) extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case GraftBucketedPartition(_, _, _, _, inner) => inner
    case other => other
  }
  override def createReader(p: InputPartition):
      org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    base.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition):
      org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] =
    base.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    base.supportColumnarReads(unwrap(p))
}

object GraftNativeScan {

  /** Masked-row fraction below which NDV/null counts are reported as
    * upper bounds under live tombstones (r14): 1% keeps the masking
    * bias under the HLL sketch's own ~1.6% relative standard error, so
    * the reported NDV is no worse than an unmasked estimate's noise.
    */
  private[weblog] val NdvMaskEpsilon = 0.01

  /** JVM-wide DECODED NDV-sketch cache, keyed by (table path, relative
    * file path, column): data files are immutable, so a decoded sketch
    * can never go stale — repeated planning over the same snapshot (or
    * overlapping pruned sets across snapshots) base64-decodes and
    * heapifies each stamp ONCE instead of once per estimateStatistics
    * call (r12: at 10⁵ files × 10 stamped columns the per-plan decode
    * was real driver CPU). LRU-bounded; sketches are read-only after
    * heapify (Union.update only reads them), so sharing across planner
    * threads is safe.
    */
  private val SketchCacheMax = 65536
  private val sketchCache: java.util.Map[(String, String, String),
      org.apache.datasketches.hll.HllSketch] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, String, String),
          org.apache.datasketches.hll.HllSketch](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, String, String),
              org.apache.datasketches.hll.HllSketch]): Boolean =
          size() > SketchCacheMax
      })

  /** Test hook: cumulative count of ACTUAL sketch decodes (cache
    * misses) — specs pin that a second plan of the same snapshot
    * decodes nothing.
    */
  private val sketchDecodeCounter = new java.util.concurrent.atomic.AtomicLong
  def sketchDecodes: Long = sketchDecodeCounter.get

  private[weblog] def decodedSketch(tablePath: String, relFile: String,
      column: String, b64: String): org.apache.datasketches.hll.HllSketch =
    sketchCache.computeIfAbsent((tablePath, relFile, column), _ => {
      sketchDecodeCounter.incrementAndGet()
      org.apache.datasketches.hll.HllSketch.heapify(
        java.util.Base64.getMimeDecoder.decode(b64))
    })

  /** Spark's reserved temporary metadata column name: a LongType field
    * under this name in the parquet read schema makes BOTH readers
    * (vectorized and parquet-mr) generate the row's ordinal within its
    * file — the row half of positional-delete identity, computed by
    * the scan itself so file splits stay correct.
    */
  private[weblog] val RowIndexCol =
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** Stamped-bound ordering under the column type (the same ordering
    * the stats stamps were written with); None = a type the stamps
    * never carry.
    */
  private[weblog] def boundOrdering(
      dt: org.apache.spark.sql.types.DataType): Option[(String, String) => Int] =
    dt match {
      case StringType => Some((a, b) =>
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case org.apache.spark.sql.types.FloatType =>
        Some((a, b) => java.lang.Float.compare(a.toFloat, b.toFloat))
      case org.apache.spark.sql.types.DoubleType =>
        Some((a, b) => java.lang.Double.compare(a.toDouble, b.toDouble))
      case _: org.apache.spark.sql.types.DecimalType =>
        Some((a, b) => new java.math.BigDecimal(a)
          .compareTo(new java.math.BigDecimal(b)))
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           IntegerType | LongType |
           // stamped as epoch micros / epoch days (r11)
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.DateType =>
        Some((a, b) => java.lang.Long.compare(a.toLong, b.toLong))
      case _ => None
    }

  /** A stamped bound string as the column type's CATALYST value (what
    * V2 column statistics carry); None = unconvertible.
    */
  private[weblog] def typedBound(
      dt: org.apache.spark.sql.types.DataType)(s: String): Option[Any] =
    try dt match {
      case StringType => Some(UTF8String.fromString(s))
      case org.apache.spark.sql.types.ByteType => Some(s.toByte)
      case org.apache.spark.sql.types.ShortType => Some(s.toShort)
      case IntegerType => Some(s.toInt)
      case LongType => Some(s.toLong)
      case org.apache.spark.sql.types.FloatType => Some(s.toFloat)
      case org.apache.spark.sql.types.DoubleType => Some(s.toDouble)
      case org.apache.spark.sql.types.TimestampType => Some(s.toLong)
      case org.apache.spark.sql.types.DateType => Some(s.toInt)
      case d: org.apache.spark.sql.types.DecimalType =>
        Some(org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(s), d.precision, d.scale))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Rename a pushed V1 filter into a schema epoch's physical names for
    * row-group pruning; None = not expressible there (the filter stays
    * residual anyway — Spark re-applies every pushed filter). AND may
    * narrow to whichever side translates at positive positions; under
    * NOT the translation must be exact (a narrowed child would WIDEN
    * under negation and prune row groups that match).
    */
  private[weblog] def translateFilter(f: sources.Filter,
      rename: String => Option[String], exact: Boolean): Option[sources.Filter] = {
    f match {
      case sources.EqualTo(a, v) => rename(a).map(sources.EqualTo(_, v))
      case sources.EqualNullSafe(a, v) => rename(a).map(sources.EqualNullSafe(_, v))
      case sources.GreaterThan(a, v) => rename(a).map(sources.GreaterThan(_, v))
      case sources.GreaterThanOrEqual(a, v) =>
        rename(a).map(sources.GreaterThanOrEqual(_, v))
      case sources.LessThan(a, v) => rename(a).map(sources.LessThan(_, v))
      case sources.LessThanOrEqual(a, v) =>
        rename(a).map(sources.LessThanOrEqual(_, v))
      case sources.In(a, vs) => rename(a).map(sources.In(_, vs))
      case sources.IsNull(a) => rename(a).map(sources.IsNull)
      case sources.IsNotNull(a) => rename(a).map(sources.IsNotNull)
      case sources.StringStartsWith(a, p) =>
        rename(a).map(sources.StringStartsWith(_, p))
      case sources.StringEndsWith(a, p) =>
        rename(a).map(sources.StringEndsWith(_, p))
      case sources.StringContains(a, p) =>
        rename(a).map(sources.StringContains(_, p))
      case sources.And(l, r) =>
        (translateFilter(l, rename, exact), translateFilter(r, rename, exact)) match {
          case (Some(a), Some(b)) => Some(sources.And(a, b))
          case (one, other) if !exact => one.orElse(other)
          case _ => None
        }
      case sources.Or(l, r) =>
        for {
          a <- translateFilter(l, rename, exact)
          b <- translateFilter(r, rename, exact)
        } yield sources.Or(a, b)
      case sources.Not(c) =>
        translateFilter(c, rename, exact = true).map(sources.Not)
      case sources.AlwaysTrue() => Some(f)
      case sources.AlwaysFalse() => Some(f)
      case _ => None
    }
  }

  /** Build the native scan for a catalog read, or None when the
    * snapshot is ineligible (the caller falls back to the V1 bridge).
    * `required` is the column-pruned user-facing schema; `pushed` the
    * V1 filters (all residual — re-applied by Spark post scan).
    */
  def forTable(spark: SparkSession, table: IcebergLikeTable,
      pinned: Option[Long], required: StructType,
      pushed: Array[sources.Filter],
      limit: Option[Int] = None,
      handled: Array[sources.Filter] = Array.empty): Option[Scan] = {
    val eligible =
      try table.nativeScanSnapshot(pinned)
      catch { case scala.util.control.NonFatal(_) => None }
    eligible.flatMap { case (snap, stored) =>
      // requested partition-directory columns must be of the leaf-path
      // parseable types; anything else reads through the V1 bridge
      val partTypesOk = table.partCols
        .flatMap(c => required.fields.find(_.name == c))
        .forall(f => f.dataType == StringType ||
          f.dataType == IntegerType || f.dataType == LongType)
      // every required DATA column must exist in the stored schema
      // (the stamped schema is what planning prunes against)
      val colsOk = required.fields
        .filterNot(f => table.partCols.contains(f.name))
        .forall(f => stored.fields.exists(_.name == f.name))
      if (!partTypesOk || !colsOk) None
      else {
        val cond = pushed
          .flatMap(graft.sources.GraftFilterBridge.toColumn(_, exact = false))
          .reduceOption(_ && _).getOrElse(lit(true))
        Some(new GraftNativeScan(spark, table, snap, required, cond,
          handled, pushed, limit))
      }
    }
  }

  /** Last planned FILE counts per table path, (static, after-runtime-
    * filter) — the observable face of join-driven pruning (specs and
    * the weblog_runtime_prune gate read it; -1 = not planned yet).
    */
  private val pruneEvents =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  private def recordPrune(path: String, n: Int, runtime: Boolean): Unit =
    pruneEvents.compute(path, (_, prev) => {
      val (s0, r0) = Option(prev).getOrElse((-1, -1))
      if (runtime) (s0, n) else (n, r0)
    })

  def lastPrune(path: String): Option[(Int, Int)] = Option(pruneEvents.get(path))

  def clearPrune(path: String): Unit = pruneEvents.remove(path)

  /** Translate a runtime V2 predicate to a `Column` IMPLIED BY it (a
    * pruning predicate may only be a superset; an untranslatable shape
    * contributes nothing). Dynamic partition pruning sends
    * `IN(col, v1..vk)` (plus IS_NOT_NULL / AND around it); values are
    * catalyst-internal and convert through [[CatalystTypeConverters]].
    */
  private[weblog] def predicateColumn(p: V2Predicate): Option[Column] = {
    def refName(e: V2Expression): Option[String] = e match {
      case r: NamedReference => Some(r.fieldNames.mkString("."))
      case _ => None
    }
    def litValue(e: V2Expression): Option[Any] = e match {
      case l: V2Literal[_] =>
        Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    p match {
      case and: V2And =>
        // AND may narrow to whichever side translates (pruning is
        // superset-sound at positive positions)
        (predicateColumn(and.left()), predicateColumn(and.right())) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (one, other) => one.orElse(other)
        }
      case _ => p.name() match {
        case "IN" =>
          for {
            c <- p.children().headOption.flatMap(refName)
            vs <- Some(p.children().drop(1).map(litValue))
            if vs.forall(_.isDefined) // partial value sets would over-prune
          } yield {
            val values = vs.flatten.filter(_ != null).toSeq
            if (values.isEmpty) lit(false) else col(c).isin(values: _*)
          }
        case "=" =>
          (p.children().toSeq match {
            case Seq(l, r) => refName(l).flatMap(c => litValue(r).map(c -> _))
              .orElse(refName(r).flatMap(c => litValue(l).map(c -> _)))
            case _ => None
          }).map { case (c, v) => col(c) === lit(v) }
        case "IS_NOT_NULL" =>
          p.children().headOption.flatMap(refName).map(c => col(c).isNotNull)
        case _ => None
      }
    }
  }
}
