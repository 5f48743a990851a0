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
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
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
  * [[IcebergLikeTable.nativeScanSnapshot]] (schema/size-stamped, no
  * live delete files, no rename/drop epochs); ineligible snapshots
  * fall back to the V1 bridge, which composes the full merge-on-read
  * and column-history machinery. Every pushed filter is declared
  * residual, so Spark re-applies them row-by-row — pruning here is an
  * I/O-only optimization, exactly like the rest of the engine.
  */
final class GraftNativeScan private (
    spark: SparkSession,
    table: IcebergLikeTable,
    snap: IcebergLikeTable.TableSnapshot,
    required: StructType,
    pushedCond: Column,
    handledCond: Option[Column],
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
    * condition, then the EXACT leaf restriction for the handled
    * partition filters — the scan promised Spark it applies those row
    * for row, and for identity partition columns dropping the
    * non-matching leaves IS row-exact (every row of a leaf shares its
    * partition values).
    */
  private def prunedExact(cond: Column): Seq[Manifests.FileEntry] = {
    val entries = table.prunedEntries(snap, cond)
    handledCond.fold(entries)(h => table.entriesWhereExact(snap, entries, h))
  }

  private def prunedNow(): Seq[Manifests.FileEntry] = {
    val entries = prunedExact(condition)
    limit match {
      // pushed LIMIT (only offered filter-free): keep files until the
      // stamped row counts cover it — whole files, Spark's own limit
      // operator trims the excess. Any unstamped count disables the cut
      // (the cover would be a guess).
      case Some(n) if entries.forall(_.rowCount >= 0L) =>
        var acc = 0L
        val kept = entries.takeWhile { e =>
          val need = acc < n; acc += e.rowCount; need
        }
        kept
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
    * shuffle entirely. The trade (Iceberg's too): task count = bucket
    * count, so the grouping engages only under the explicit conf.
    */
  private def bucketGrouping: Boolean =
    table.uniqueKeys.nonEmpty &&
      SQLConf.get.getConfString(
        "spark.sql.sources.v2.bucketing.enabled", "false") == "true" &&
      table.uniqueKeys.forall(readSchema().fieldNames.contains)

  /** The gbucket value of a leaf path, if present. */
  private def bucketOf(relFile: String): Option[Int] =
    table.leafOf(relFile).split('/')
      .find(_.startsWith(s"${table.bucketCol}="))
      .flatMap(_.substring(table.bucketCol.length + 1).toIntOption)

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
    staticBuckets match {
      case Some(buckets) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
            table.numBuckets, table.uniqueKeys: _*)),
          buckets.size)
      case None => new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
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
    staticBuckets match {
      case Some(buckets) =>
        // one unsplit partition per STATIC key bucket, stamped with its
        // key — including buckets the runtime filter (or the limit cut)
        // emptied, which plan as zero-file partitions so the key-group
        // count never changes under Spark's feet. Entries here are a
        // subset of the static set (pruning only ever removes files as
        // conjuncts are added), so every bucket parses.
        val byBucket = entries.groupBy(e => bucketOf(e.path).getOrElse(
          throw new IllegalStateException(
            s"file without a parseable ${table.bucketCol}= leaf survived " +
              s"runtime pruning but not static pruning under ${table.path}")))
        buckets.zipWithIndex.map { case (bucket, i) =>
          GraftBucketedPartition(bucket,
            FilePartition(i,
              filesOf(byBucket.getOrElse(bucket, Nil), Long.MaxValue).toArray))
            : InputPartition
        }.toArray
      case None =>
        FilePartition.getFilePartitions(spark, filesOf(entries, maxSplitBytes),
          maxSplitBytes).toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val sqlConf = SQLConf.get
    val hadoopConf = spark.sessionState.newHadoopConf()
    // the reader-side contract Spark's own ParquetScan stamps into the
    // broadcast configuration (the requested-schema/read-support keys
    // the row reader resolves; timezone + binary/int96 semantics for
    // both readers) — without these the parquet-mr path NPEs and
    // timestamps could shift
    val schemaJson = readDataSchema.json
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
    // pushed filters reach the row-group stats (a filter naming a
    // partition-directory column simply finds no footer column and
    // prunes nothing there — the partition pruning already handled it)
    new GraftUnwrappingReaderFactory(ParquetPartitionReaderFactory(
      sqlConf,
      bc,
      readDataSchema,
      readDataSchema,
      readPartSchema,
      pushedFilters,
      None,
      new ParquetOptions(Map.empty[String, String], sqlConf)))
  }

  /** Statistics of the PRUNED file set — manifest sums, zero I/O.
    * Unknown row counts (legacy entries) report size only.
    */
  override def estimateStatistics(): Statistics = {
    val entries = prunedNow()
    val bytes = math.max(1L, entries.map(e => math.max(0L, e.size)).sum)
    val rows =
      if (entries.forall(_.rowCount >= 0L)) OptionalLong.of(entries.map(_.rowCount).sum)
      else OptionalLong.empty()
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = rows
    }
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

/** A key-grouped input partition: one bucket's files (across every
  * partition value), stamped with the bucket id as its partition key —
  * what [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * groups storage-partitioned joins by.
  */
private[weblog] final case class GraftBucketedPartition(bucket: Int,
    inner: FilePartition) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Delegates to the parquet reader factory, unwrapping
  * [[GraftBucketedPartition]] down to its [[FilePartition]].
  */
private[weblog] final class GraftUnwrappingReaderFactory(
    base: ParquetPartitionReaderFactory) extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case GraftBucketedPartition(_, inner) => inner
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
        // HANDLED filters (declared applied-by-the-scan at pushdown —
        // Spark does NOT re-apply them) must translate EXACTLY; the
        // scan builder only marks filters it verified translate, so a
        // miss here is an internal contract break, not a fallback case
        val handledCond = handled
          .map(f => graft.sources.GraftFilterBridge.toColumn(f, exact = true)
            .getOrElse(throw new IllegalStateException(
              s"handled filter $f does not translate exactly")))
          .reduceOption(_ && _)
        Some(new GraftNativeScan(spark, table, snap, required, cond,
          handledCond, pushed, limit))
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
