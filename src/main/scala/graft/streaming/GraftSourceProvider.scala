package graft.streaming

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.StreamingFrameBridge
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, PrunedFilteredScan, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.weblog.IcebergLikeTable

/** `spark.readStream.format("graft")` — the table's change feed as a
  * first-class Structured Streaming SOURCE, so downstream jobs follow
  * an [[IcebergLikeTable]] with standard triggers, checkpoints and
  * foreachBatch instead of driving [[graft.weblog.TableStream]]'s
  * drain loop themselves (the composability Iceberg/Delta expose as
  * streaming table reads).
  *
  * Offsets ARE table versions (`LongOffset(version)`, checkpointed by
  * the engine): the first batch delivers the live snapshot as
  * `insert` rows, every later batch the row-level changes of its
  * (start, end] version window — `changesBetween` for keyed tables
  * (leaf-pruned, O(changed leaves)), `appendsBetween` for append-only
  * ones. Restart resumes from the checkpointed version; a checkpoint
  * older than the retention window fails the read with the
  * changelog's own expired-snapshot error, exactly like Iceberg's
  * incremental reads — size `retainVersions` to the slowest consumer.
  *
  * Options: `path` (table root, required), `uniqueKeys`
  * (comma-separated; empty = append-only), `partitionCol` (default
  * `event`), `numBuckets` (default 16), `branch` (default `main`).
  * Admission control: `initialChunkLeaves` (default 256) bounds the
  * initial load to that many leaf partitions per chunk,
  * `maxChunksPerTrigger` (default 1) chunks per micro-batch,
  * `maxVersionsPerTrigger` (default unlimited) caps how many table
  * versions a caught-up stream advances per micro-batch, and
  * `maxBytesPerTrigger` (default unlimited; accepts `128m`/`1g`) caps
  * the manifest-stamped bytes a micro-batch admits — the size half of
  * Firehose's size-or-time flush (the reference's 128 MB
  * buffering_size, web-analytics-parquet/.example.cdk.context.json:10)
  * — so a lagging restart or a 100 TB initial mirror makes bounded,
  * checkpointed progress instead of one giant batch.
  *
  * Implemented against the V1 `Source` API (the one `getBatch:
  * DataFrame` surface — Delta Lake's streaming source uses the same),
  * which the engine auto-wraps for Trigger.AvailableNow.
  */
final class GraftSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  /** BATCH read: `spark.read.format("graft").option("path", …).load()`
    * (and `CREATE TABLE … USING graft OPTIONS (…)`). The relation's
    * scan pushes column pruning and the supported filters through the
    * table's OWN planning ([[IcebergLikeTable.readWhere]] — manifest
    * partition values, hidden-partition transform bounds, stamped
    * stats, bloom sidecars), so a predicate skips files before any
    * task is scheduled; Spark re-applies every filter on the survivors
    * (the relation declares them all unhandled), keeping the pushdown
    * purely an I/O optimization.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new GraftBatchRelation(sqlContext, tableFor(sqlContext, parameters))

  /** BATCH write: `df.write.format("graft").mode(…).save()`.
    * `Append` routes by the table's declaration — key-less append, or
    * keyed order-aware upsert (option `orderCol` required);
    * `Overwrite` is the one-snapshot [[IcebergLikeTable.overwrite]];
    * `ErrorIfExists`/`Ignore` follow their SaveMode contracts against
    * table existence.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val table = tableFor(sqlContext, parameters)
    val orderCol = opt(parameters, "orderCol")
    def writeAppend(): Unit =
      if (table.uniqueKeys.isEmpty) table.append(data)
      else table.upsert(data, orderCol.getOrElse(
        throw new IllegalArgumentException(
          "batch-appending to a keyed graft table needs option 'orderCol'")))
    mode match {
      case SaveMode.Append => writeAppend()
      case SaveMode.Overwrite => table.overwrite(data)
      case SaveMode.ErrorIfExists =>
        if (table.exists) throw new IllegalStateException(
          s"graft table already exists: ${table.path}")
        writeAppend()
      case SaveMode.Ignore => if (!table.exists) writeAppend()
    }
    new GraftBatchRelation(sqlContext, table)
  }

  private def opt(params: Map[String, String], key: String): Option[String] =
    params.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private def tableFor(sqlContext: SQLContext,
      params: Map[String, String]): IcebergLikeTable = {
    val path = opt(params, "path").getOrElse(throw new IllegalArgumentException(
      "the graft source needs option 'path' (the table root)"))
    def cols(key: String): Seq[String] = opt(params, key)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    IcebergLikeTable(
      sqlContext.sparkSession,
      path,
      partitionCol = opt(params, "partitionCol").getOrElse("event"),
      uniqueKeys = cols("uniqueKeys"),
      numBuckets = opt(params, "numBuckets").map(_.toInt).getOrElse(16),
      retainVersions = opt(params, "retainVersions").map(_.toInt).getOrElse(8),
      statsColumns = cols("statsColumns"),
      bloomColumns = cols("bloomColumns"),
      branch = opt(params, "branch").getOrElse("main"),
      partitionTransform = opt(params, "partitionTransform"))
  }

  /** The change-row schema: the table's user-facing columns (all
    * nullable, as stamped) plus the CDC envelope.
    */
  private def changeSchema(t: IcebergLikeTable): StructType = {
    val base = t.read.schema
    StructType(
      StructField("_change_type", StringType, nullable = true) +:
        base.fields.toSeq :+
        StructField("_commit_version", LongType, nullable = true))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      changeSchema(tableFor(sqlContext, parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableFor(sqlContext, parameters)
    def intOpt(key: String, default: Int): Int =
      opt(parameters, key).map(_.toInt).getOrElse(default)
    // "134217728", "128m", "1gb" — Firehose-style size budgets read
    // like the reference's buffering_size knob; parsed by Spark's own
    // size-string parser (proper k/kb/m/mb/g/gb handling + errors),
    // and non-positive values refuse instead of silently clamping
    val fractional = "^([0-9]*\\.[0-9]+)\\s*([kmgtp]?)b?$".r
    def bytesOpt(key: String, default: Long): Long =
      opt(parameters, key).map { raw =>
        val v = raw.trim.toLowerCase match {
          // "1.5g": Spark's parser is integer-only; scale fractions here
          case fractional(n, suf) =>
            val mult = suf match {
              case "k" => 1L << 10; case "m" => 1L << 20
              case "g" => 1L << 30; case "t" => 1L << 40
              case "p" => 1L << 50; case _ => 1L
            }
            (n.toDouble * mult).toLong
          case s =>
            try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
            catch { case e: Exception => throw new IllegalArgumentException(
              s"option '$key' is not a byte size: '$raw'", e) }
        }
        require(v > 0L, s"option '$key' must be positive, got '$raw'")
        v
      }.getOrElse(default)
    new GraftTableSource(sqlContext, table,
      schema.getOrElse(changeSchema(table)),
      maxVersionsPerTrigger = intOpt("maxVersionsPerTrigger", Int.MaxValue),
      initialChunkLeaves = intOpt("initialChunkLeaves", 256),
      maxChunksPerTrigger = intOpt("maxChunksPerTrigger", 1),
      maxBytesPerTrigger = bytesOpt("maxBytesPerTrigger", Long.MaxValue))
  }

  /** `df.writeStream.format("graft")` — the table as a first-class
    * Structured Streaming SINK with exactly-once micro-batch replay
    * (the `appendId = (streamId, batchId)` high-water mark every table
    * commit carries; a batch replayed after a crash between commit and
    * checkpoint is a clean skip). Modes, chosen by the TABLE's own
    * declaration:
    *
    *  - key-less table → [[IcebergLikeTable.append]] per batch;
    *  - `uniqueKeys` + option `orderCol` → order-aware
    *    [[IcebergLikeTable.upsert]] (a late/replayed batch cannot
    *    clobber newer rows);
    *  - option `cdc=true` additionally interprets the change-feed
    *    envelope (`_change_type`/`_commit_version`, the exact schema
    *    the graft SOURCE emits): inserts + update_postimages merge as
    *    upserts, deletes become one-commit MERGE tombstones,
    *    update_preimages drop — so
    *    `readStream.format("graft") → writeStream.format("graft")`
    *    is a crash-safe, exactly-once table mirror through nothing but
    *    the standard engine (what [[graft.weblog.TableStream.mirrorInto]]
    *    hand-drives). Recommended `orderCol` for CDC: `_commit_version`
    *    is already version-major; any stored order column works too.
    *
    * `streamId` defaults to the query's `checkpointLocation` (stable
    * across restarts, distinct across queries) — pass it explicitly
    * when two queries share a checkpoint root.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val table = tableFor(sqlContext, parameters)
    val orderCol = opt(parameters, "orderCol")
    require(table.uniqueKeys.isEmpty || orderCol.nonEmpty,
      "writing to a keyed graft table needs option 'orderCol' " +
        "(last-write-wins ordering for the merge)")
    val cdc = opt(parameters, "cdc").exists(_.trim.toBoolean)
    require(!cdc || table.uniqueKeys.nonEmpty,
      "cdc=true needs a keyed table (uniqueKeys) to apply deletes")
    val streamId = opt(parameters, "streamId")
      .orElse(opt(parameters, "checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "the graft sink needs option 'streamId' (or a checkpointLocation " +
          "to derive it from) for exactly-once replay marks"))
    new GraftTableSink(table, orderCol, streamId, cdc)
  }
}

/** V1 sink: re-roots each trigger's already-incrementalized rows as a
  * batch frame and drives the table's commit protocol. All
  * exactly-once/ordering guarantees live in the table commit
  * (HWM mark + order-aware merge), not here — the sink is routing.
  */
private[streaming] final class GraftTableSink(table: IcebergLikeTable,
    orderCol: Option[String], streamId: String, cdc: Boolean) extends Sink {

  private val Envelope = Set("_change_type", "_commit_version")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val batch = StreamingFrameBridge.batchFrame(spark,
      data.queryExecution.toRdd, data.schema)
    val id = Some((streamId, batchId))
    if (!cdc) {
      if (table.uniqueKeys.isEmpty) table.append(batch, id)
      else table.upsert(batch, orderCol.get, id)
    } else {
      // One pass over the trigger's rows feeds both merge sides.
      val pinned = batch.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val userCols = batch.columns.filterNot(Envelope.contains)
        val ord = orderCol.get
        val carry = // tombstones must route + order: keys, partition, order
          (table.uniqueKeys :+ table.partitionCol :+ ord).distinct
        // the order column is STORED by the merge (it must be — the
        // stored value participates in later comparisons), so carry it
        // even when it is the envelope's _commit_version
        val upsertCols =
          userCols.toSeq ++ (if (userCols.contains(ord)) Nil else Seq(ord))
        val upserts = pinned
          .filter(col("_change_type").isin("insert", "update_postimage"))
          .select(upsertCols.map(col): _*)
        val deletes = pinned
          .filter(col("_change_type") === "delete")
          .select(carry.map(col): _*)
        table.merge(upserts, deletes, ord, id)
      } finally pinned.unpersist()
    }
  }
}

/** V1 batch relation over the live snapshot: `buildScan` translates
  * the engine's pushed filters back into a `Column` predicate and
  * reads through [[IcebergLikeTable.readWhere]], so the table's whole
  * pruning stack (manifest partition values + hidden-partition
  * transform inversion + stamped stats + blooms + merge-on-read
  * deletes) runs at PLANNING time inside the relation. All filters are
  * declared unhandled — Spark re-evaluates them row-by-row on the
  * survivors, so a partial translation can only cost I/O, never rows.
  */
private[streaming] final class GraftBatchRelation(
    val sqlContext: SQLContext, table: IcebergLikeTable)
    extends BaseRelation with PrunedFilteredScan {

  override val schema: StructType = table.read.schema

  /** Manifest-resolved size (one map-sum over the live entries, zero
    * I/O): without this override the V1 default is
    * `spark.sql.defaultSizeInBytes` (max), so a small graft table would
    * NEVER auto-broadcast in a join. Legacy tables with unstamped
    * sizes keep the conservative default — a false "tiny" claim would
    * broadcast an arbitrarily large table.
    */
  override def sizeInBytes: Long =
    table.dataBytesEstimate.map(b => math.max(1L, b))
      .getOrElse(super.sizeInBytes) // conservative default for legacy sizes

  // every filter is re-applied by the engine; translation is I/O-only
  override def unhandledFilters(filters: Array[sources.Filter]): Array[sources.Filter] =
    filters

  /** Translate a pushed filter to a `Column`. The result must be
    * IMPLIED by the original filter (a superset predicate is the most
    * a file-pruner may assume): at a positive position (`exact=false`)
    * an AND may narrow to whichever side translates, since
    * `a AND b ⟹ a` — but under NOT the implication flips, so
    * everything inside a negation must translate EXACTLY or the whole
    * negation is dropped.
    */
  private def toColumn(f: sources.Filter, exact: Boolean): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      (toColumn(l, exact), toColumn(r, exact)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (one, other) if !exact => one.orElse(other)
        case _ => None
      }
    case sources.Or(l, r) =>
      // OR never narrows: both sides must translate
      for { a <- toColumn(l, exact); b <- toColumn(r, exact) } yield a || b
    case sources.Not(c) => toColumn(c, exact = true).map(!_)
    case sources.StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case sources.StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case sources.StringContains(a, p) => Some(col(a).contains(p))
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[sources.Filter]): RDD[Row] = {
    val cond = filters.flatMap(toColumn(_, exact = false))
      .reduceOption(_ && _).getOrElse(lit(true))
    val pruned = table.readWhere(cond)
    val projected =
      if (requiredColumns.isEmpty)
        // COUNT-style scans: one cheap literal column, not the row
        pruned.select(lit(1))
      else pruned.select(requiredColumns.toIndexedSeq.map(col): _*)
    if (requiredColumns.isEmpty) projected.rdd.map(_ => Row.empty)
    else projected.rdd
  }
}

/** A mid-initial-load offset: snapshot `v` pinned, `c` of its `k`
  * deterministic leaf chunks delivered. Complete offsets stay plain
  * [[LongOffset]] versions (checkpoint-compatible with pre-chunking
  * streams); equality is json equality (the connector-Offset
  * contract), so a checkpointed `SerializedOffset` round-trips.
  */
private[streaming] final case class GraftChunkOffset(v: Long, c: Int, k: Int)
    extends Offset {
  override def json: String = s"""{"v":$v,"c":$c,"k":$k}"""
}

private[streaming] final class GraftTableSource(sqlContext: SQLContext,
    table: IcebergLikeTable, declared: StructType,
    maxVersionsPerTrigger: Int, initialChunkLeaves: Int,
    maxChunksPerTrigger: Int,
    maxBytesPerTrigger: Long = Long.MaxValue) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger >= 1, "maxVersionsPerTrigger must be >= 1")
  require(initialChunkLeaves >= 1, "initialChunkLeaves must be >= 1")
  require(maxChunksPerTrigger >= 1, "maxChunksPerTrigger must be >= 1")
  require(maxBytesPerTrigger >= 1L, "maxBytesPerTrigger must be >= 1")

  override def schema: StructType = declared

  /** Trigger.AvailableNow, first-class (the same V1-source admission-
    * control surface Kafka's source uses — no engine fallback, no
    * "single batch execution" warning): `prepare` pins the live table
    * version at query start, `latestOffset` caps every micro-batch at
    * that pin, so the run drains exactly the data that existed when it
    * started and stops — commits landing mid-run wait for the next run.
    */
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.currentVersion.getOrElse(0L))

  /** The newest version this trigger may reach (the AvailableNow pin
    * caps the live version when set). */
  private def horizon: Option[Long] = {
    val cur = table.currentVersion
    (availableNowEnd match {
      case Some(cap) => cur.map(math.min(_, cap)).orElse(Some(cap))
      case None => cur
    }).filter(_ > 0L)
  }

  /** Decode an offset (live, or `SerializedOffset` json from the
    * checkpoint): plain long = complete through that version; object =
    * mid-initial-load [[GraftChunkOffset]].
    */
  private def decode(o: Offset): (Long, Option[(Int, Int)]) = o match {
    case l: LongOffset => (l.offset, None)
    case GraftChunkOffset(v, c, k) => (v, Some((c, k)))
    case other =>
      val t = other.json.trim
      if (t.startsWith("{")) {
        val re = """\{"v":(\d+),"c":(\d+),"k":(\d+)\}""".r
        t match {
          case re(v, c, k) => (v.toLong, Some((c.toInt, k.toInt)))
          case _ => throw new IllegalStateException(s"bad graft offset: $t")
        }
      } else (t.toLong, None)
  }

  /** Admission control: the initial snapshot is delivered as at most
    * `maxChunksPerTrigger` leaf chunks (of `initialChunkLeaves` leaves
    * each) per micro-batch, and a caught-up stream advances at most
    * `maxVersionsPerTrigger` table versions per micro-batch — so a
    * restart after lag (or a 100 TB initial mirror) makes bounded,
    * checkpointed progress per trigger instead of one giant batch.
    * The chunk count `k` rides the offset itself: a resume re-slices
    * the SAME deterministic sorted-leaf domain even if the option
    * changed across restarts.
    */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset = {
    val startState = Option(start).map(o => decode(o.asInstanceOf[Offset]))
    startState match {
      case None =>
        horizon match {
          case None => null
          case Some(v) =>
            // chunk count from BOTH budgets: enough chunks that each
            // stays under initialChunkLeaves leaves AND (approximately,
            // equal-leaf-count slicing) under maxBytesPerTrigger bytes —
            // the Firehose-style size-or-count flush, manifest-resolved
            val nLeaves = table.dataLeavesAt(v).size
            val byLeaves = (nLeaves + initialChunkLeaves - 1) / initialChunkLeaves
            val byBytes =
              if (maxBytesPerTrigger == Long.MaxValue) 1L
              else math.min(nLeaves.toLong, // a chunk is at least one leaf
                (table.dataBytesAt(v) + maxBytesPerTrigger - 1) / maxBytesPerTrigger)
            val k = math.max(1, math.max(byLeaves.toLong, byBytes).toInt)
            val c = math.min(maxChunksPerTrigger, k)
            if (c >= k) LongOffset(v) else GraftChunkOffset(v, c, k)
        }
      case Some((v, Some((c0, k)))) => // mid-initial-load: finish the pin
        val c = math.min(c0 + maxChunksPerTrigger, k)
        if (c >= k) LongOffset(v) else GraftChunkOffset(v, c, k)
      case Some((s, None)) =>
        horizon match {
          case Some(live) if live > s =>
            val cap = math.min(live, s + maxVersionsPerTrigger.toLong)
            LongOffset(byteCapped(s, cap))
          case _ => LongOffset(s) // caught up: unchanged offset, no batch
        }
    }
  }

  /** Largest end version in (start, cap] whose cumulative ADDED data
    * bytes (manifest-stamped, zero I/O) stay within maxBytesPerTrigger
    * — the size half of size-or-count admission. Always admits at
    * least one version (a single oversized commit must still drain).
    * An expired start snapshot falls back to the count cap: getBatch
    * surfaces the real retention error if the window is unreadable.
    */
  private def byteCapped(start: Long, cap: Long): Long =
    if (maxBytesPerTrigger == Long.MaxValue || cap <= start + 1) cap
    else if (!table.versions.contains(start))
      // expired start snapshot: byte sizing is impossible (the base
      // file set is gone) — fall back to the count cap and let getBatch
      // surface the real retention error if the window is unreadable.
      // A PRE-CHECK, not a NoSuchElementException catch: a broad catch
      // would also mask unrelated manifest/snapshot-resolution bugs and
      // quietly disable the operator-chosen byte budget
      cap
    else table.byteCappedEnd(start, cap, maxBytesPerTrigger)

  override def reportLatestOffset():
      org.apache.spark.sql.connector.read.streaming.Offset =
    table.currentVersion.map(LongOffset(_)).orNull

  override def getOffset: Option[Offset] =
    table.currentVersion.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (endV, endChunk) = decode(end)
    val startState = start.map(decode)
    val spark = sqlContext.sparkSession
    // initial-load chunk windows share the pinned snapshot's sorted
    // leaf domain, sliced by the k STAMPED IN THE OFFSET
    def leafSlice(k: Int, from: Int, until: Int): DataFrame = {
      val leaves = table.dataLeavesAt(endV)
      val sz = math.max(1, (leaves.size + k - 1) / k)
      table.readLeavesAt(endV, leaves.slice(from * sz, until * sz).toSet)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(endV))
    }
    val window: Option[DataFrame] = (startState, endChunk) match {
      case (Some((s, None)), None) if s >= endV =>
        None // no-op window (engine bookkeeping)
      case (None | Some((0L, None)), Some((c, k))) =>
        // first chunks of the initial load
        Some(leafSlice(k, 0, c))
      case (Some((v0, Some((c0, k)))), Some((c, _))) =>
        require(v0 == endV, s"chunk window crosses snapshots: $v0 -> $endV")
        Some(leafSlice(k, c0, c))
      case (Some((v0, Some((c0, k)))), None) =>
        // final chunk group completes the pinned snapshot
        require(v0 == endV, s"chunk window crosses snapshots: $v0 -> $endV")
        Some(leafSlice(k, c0, k))
      case (None | Some((0L, _)), None) =>
        // single-window initial load: the snapshot as inserts
        Some(table.readAt(endV)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(endV)))
      case (Some((s, None)), None) =>
        Some(
          if (table.uniqueKeys.nonEmpty) table.changesBetween(s, endV)
          else table.appendsBetween(s, endV)
            .withColumn("_change_type", lit("insert")))
      case (s, e) =>
        throw new IllegalStateException(s"bad graft offset window: $s -> $e")
    }
    window match {
      case None => StreamingFrameBridge.emptyStreamingFrame(spark, declared)
      case Some(df) =>
        // align to the declared column order/types, then re-flag the
        // plan as streaming (V1 getBatch contract)
        val aligned = df.select(
          declared.fields.toSeq.map(f => col(f.name).cast(f.dataType)): _*)
        StreamingFrameBridge.streamingFrame(spark,
          aligned.queryExecution.toRdd, declared)
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
