package graft.weblog

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The table as a first-class Catalyst relation: a custom [[FileIndex]]
  * that resolves the MANIFEST (never a directory listing) and applies
  * the engine's planning-time pruning inside Spark's own scan planning
  * — partition pruning from Catalyst's `partitionFilters`, then
  * [[FileStats]] min/max interval pruning and [[BloomStats]] point
  * membership from `dataFilters` — so
  *
  *   `table.toDF(spark).filter($"user_id" === "u42")`
  *
  * file-skips exactly like [[IcebergLikeTable.readWhere]] but through
  * the standard `DataFrame` API: the scan that survives is Spark's
  * vectorized parquet reader inside WholeStageCodegen, `.explain` shows
  * the relation's PartitionFilters/DataFilters, and every downstream
  * optimization (column pruning, filter pushdown to row groups, AQE)
  * composes untouched. This is how Iceberg/Delta integrate their
  * manifest+stats planning with Spark — the FileIndex IS the
  * integration point.
  *
  * The index is pinned to the snapshot resolved at construction
  * (snapshot isolation for the DataFrame's whole lifetime; `refresh()`
  * re-resolves). Planning cost: the manifest resolve ONLY — file sizes
  * come from the manifest entries stamped at import, so building the
  * relation makes ZERO `listStatus` round trips and opens no parquet
  * footer (legacy manifests without size stamps fall back to one
  * `listStatus` per leaf; `listStatusCalls` counts them, specs pin 0).
  */
final class GraftFileIndex(spark: SparkSession, table: IcebergLikeTable)
  extends FileIndex {

  private val root = new Path(table.path)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Directory-listing round trips made while loading the current
    * state: 0 for size-stamped manifests — the observable face of
    * manifest-resolved planning.
    */
  @volatile private[weblog] var listStatusCalls: Int = 0

  private final case class State(
      version: Long,
      snap: IcebergLikeTable.TableSnapshot,
      files: Seq[String],
      schema: StructType,
      stats: FileStats.Stats,
      blooms: BloomStats.Sidecar,
      statusOf: Map[String, FileStatus])

  @volatile private var state: State = load()

  /** The snapshot this index is pinned to — [[IcebergLikeTable.toDF]]
    * applies the SAME snapshot's equality-delete files on top of the
    * relation, so the pair can never straddle a concurrent commit.
    */
  private[weblog] def pinnedSnapshot: IcebergLikeTable.TableSnapshot = state.snap

  private def load(): State = {
    val (v, snap) = table.resolveLive()
    val schema = table.storedSchema(snap.meta).getOrElse(
      throw new IllegalStateException(
        s"GraftFileIndex needs a schema-stamped manifest under ${table.path} " +
          "(any commit made by this library version stamps it)"))
    // hidden-partition inverse bounds ride the SAME per-file interval
    // map as stamped stats, so a dataFilter on a transform SOURCE
    // column (days/hours/truncate/multi legs) file-skips through the
    // relation exactly like readWhere; a stamped bound for the same
    // column (tighter than the inverse image) takes precedence
    val synth = table.transformBoundsFn(snap.meta)
    val stampedStats = snap.statsOf
    val stats: FileStats.Stats = snap.dataFiles.flatMap { f =>
      val merged = synth(f) ++ stampedStats.getOrElse(f, Map.empty)
      if (merged.isEmpty) None else Some(f -> merged)
    }.toMap
    val blooms = table.bloomSidecarsOf(snap.meta)
      .map(n => BloomStats.read(fs, new Path(root, n)))
      .foldLeft(Map.empty: BloomStats.Sidecar)(_ ++ _)
    var listCalls = 0
    // the relation scans DATA files only — equality-delete files are
    // manifest metadata applied by toDF's anti-join, never data
    val (stamped, unstamped) = snap.dataEntries.partition(_.size >= 0L)
    // stamped entries: FileStatus synthesized from the manifest — no
    // filesystem round trip at all (mod time 0 is fine: the scan keys
    // on path + length, and the snapshot's files are immutable)
    val fromManifest = stamped.map { e =>
      e.path -> new FileStatus(e.size, false, 1, 128L * 1024 * 1024, 0L,
        new Path(root, e.path))
    }
    // legacy entries (pre-stamp manifests): one listStatus per leaf
    val byLeaf = unstamped.map(_.path)
      .groupBy(f => f.take(f.lastIndexOf('/') + 1))
    val fromListing = byLeaf.flatMap { case (leaf, files) =>
      val dir = if (leaf.isEmpty) root else new Path(root, leaf.dropRight(1))
      val names = files.map(f => f.drop(leaf.length)).toSet
      listCalls += 1
      fs.listStatus(dir).filter(s => names.contains(s.getPath.getName))
        .map(s => s"$leaf${s.getPath.getName}" -> s).toSeq
    }
    val statusOf = (fromManifest ++ fromListing).toMap
    // every manifest data file must have a status — a missing one (e.g.
    // a reader older than the retention window racing GC) must surface,
    // not silently shrink the scan
    val missing = snap.dataFiles.filterNot(statusOf.contains)
    if (missing.nonEmpty)
      throw new java.io.FileNotFoundException(
        s"snapshot v$v references ${missing.size} file(s) no longer on disk " +
          s"(retention race?); first: ${missing.head}")
    listStatusCalls = listCalls
    State(v, snap, snap.dataFiles, schema, stats, blooms, statusOf)
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType =
    StructType(table.partCols.map(c => state.schema.apply(c)))

  /** The non-partition half of the stamped schema (what the relation's
    * data files carry).
    */
  def dataSchema: StructType =
    StructType(state.schema.fields.filterNot(f => table.partCols.contains(f.name)))

  /** Partition values of a leaf path (`event=view/gbucket=3/`), typed
    * per the partition schema, Spark's own path escaping.
    */
  private def partitionValues(leaf: String): InternalRow = {
    val bySegment = leaf.split("/").filter(_.nonEmpty).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i < 0) None
      else Some(seg.take(i) ->
        ExternalCatalogUtils.unescapePathName(seg.drop(i + 1)))
    }.toMap
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      val raw = bySegment.getOrElse(f.name,
        throw new IllegalStateException(s"leaf '$leaf' lacks partition ${f.name}"))
      // Hive's null-partition sentinel is a NULL value, not a literal
      // (a void-transform/unpartitioned table's every leaf is one)
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      else f.dataType match {
        case StringType => UTF8String.fromString(raw)
        case IntegerType => raw.toInt
        case LongType => raw.toLong
        case other => throw new IllegalStateException(
          s"unsupported partition type $other for ${f.name}")
      }
    })
  }

  /** Bind by name and interpret a partition predicate against a leaf's
    * values (the same by-name binding Spark's own file indexes use).
    */
  private def partitionMatches(filters: Seq[Expression], row: InternalRow): Boolean =
    filters.forall { e =>
      try {
        val bound = e.transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema.fields(i).dataType, nullable = true)
        }
        bound.eval(row) == true
      } catch {
        // a filter shape we cannot bind/evaluate keeps the leaf — the
        // real filter still applies at scan time, so this stays sound
        case scala.util.control.NonFatal(_) => true
      }
    }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val s = state
    val byLeaf = s.files.groupBy(f => f.take(f.lastIndexOf('/') + 1))
    byLeaf.toSeq.sortBy(_._1).flatMap { case (leaf, files) =>
      val values = partitionValues(leaf)
      if (!partitionMatches(partitionFilters, values)) None
      else {
        val kept = files.filter { f =>
          dataFilters.forall { e =>
            val member: FileStats.Membership = (colName, value, dt) =>
              s.blooms.get(f).flatMap(_.get(colName)).map(bytes =>
                BloomStats.filterOf(bytes)
                  .mightContainLong(BloomStats.hashOf(value, dt)))
            FileStats.mayMatch(s.stats.getOrElse(f, Map.empty), s.schema, e, member)
          }
        }
        if (kept.isEmpty) None
        else Some(PartitionDirectory(values,
          kept.flatMap(f => s.statusOf.get(f)).toArray[FileStatus]))
      }
    }
  }

  override def inputFiles: Array[String] =
    state.files.map(f => new Path(root, f).toString).toArray

  override def refresh(): Unit = { state = load() }

  override def sizeInBytes: Long = state.statusOf.values.map(_.getLen).sum
}

object GraftFileIndex {

  /** Build the Catalyst relation: manifest-resolved file index + the
    * stock vectorized parquet format. The returned DataFrame includes
    * the internal `gbucket` layout column on keyed tables (it is a
    * partition column of the relation — project it away for users, or
    * filter on it for manual bucket pruning).
    */
  def relation(spark: SparkSession, table: IcebergLikeTable): DataFrame =
    relationWithSnapshot(spark, table)._1

  /** As above, also returning the snapshot the relation is pinned to —
    * the caller ([[IcebergLikeTable.toDF]]) applies that SAME
    * snapshot's equality-delete files so relation and delete set can
    * never straddle a concurrent commit.
    */
  private[weblog] def relationWithSnapshot(spark: SparkSession,
      table: IcebergLikeTable): (DataFrame, IcebergLikeTable.TableSnapshot) = {
    val index = new GraftFileIndex(spark, table)
    val rel = HadoopFsRelation(
      index,
      index.partitionSchema,
      index.dataSchema,
      None,
      new ParquetFileFormat,
      Map.empty[String, String])(spark)
    (spark.baseRelationToDataFrame(rel), index.pinnedSnapshot)
  }
}
