package graft.weblog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-style consumption of a table's change feed —
  * the table-as-stream-source loop that closes the CDC circle the
  * reference's Firehose→Iceberg path implies downstream (Iceberg/Delta
  * expose the same capability as streaming reads of a table).
  *
  * [[processAvailableNow]] is the AvailableNow drain: each committed
  * (cursor, live] window becomes one micro-batch handed to `process`
  * with foreachBatch semantics — the batch id is the window's END
  * VERSION (stable under replay), and the cursor is acked only AFTER
  * the processor returns, so a crash re-delivers the unacked window
  * (at-least-once). End-to-end exactly-once follows the standard
  * foreachBatch + idempotent-sink recipe: a processor whose sink
  * dedupes on the batch id — e.g. an [[IcebergLikeTable]] written with
  * `appendId = (consumer, batchId)` — commits each window's effect
  * once no matter how often the window is replayed.
  *
  * [[mirrorInto]] is that composition packaged: it maintains a live
  * REPLICA of a source table by folding each window's row-level
  * changes into a keyed target through ONE
  * [[IcebergLikeTable.merge]] commit per window — inserts/update
  * postimages upsert, deletes ride along as key tombstones (both
  * ordered by `_commit_version`, so a replayed older window can never
  * clobber newer rows), and the exactly-once mark covers the whole
  * window. Cost per drain is O(changed leaves) on the source (the
  * changelog diff) plus O(affected leaves) on the target (the merge),
  * never O(table); tombstones flow as DataFrame rows, never through
  * the driver.
  */
object TableStream {

  /** One drained micro-batch's coordinates: the (from, to] version
    * window, the initial-load chunk (index, total) when the window is
    * one bounded slice of a chunked initial load, and the batch id a
    * dedup-capable sink should key on. Batch ids are version-major —
    * `toVersion * 2^20 + ordinal` — so every chunk of an initial load
    * gets its OWN id (a shared id would make the sink's high-water mark
    * skip all chunks after the first) while still sorting strictly
    * below any later window's id; complete windows take the top
    * ordinal. 2^20 chunks per window is a bound on LEAF GROUPS, not
    * leaves — unreachable in practice, and clamped defensively.
    */
  final case class BatchInfo(fromVersion: Long, toVersion: Long,
      chunk: Option[(Int, Int)] = None) {
    def batchId: Long = {
      val scale = 1L << 20
      val ordinal = chunk match {
        case Some((k, _)) => math.min(k.toLong, scale - 2)
        case None => scale - 1
      }
      toVersion * scale + ordinal
    }
  }

  /** Drain the feed until the consumer is caught up (Trigger
    * .AvailableNow over table versions): polls, hands each window to
    * `process`, acks, repeats — up to `maxBatches` windows. Returns the
    * number of windows processed. A `process` that throws leaves the
    * cursor unacked, so the next drain re-delivers the same window.
    */
  def processAvailableNow(table: IcebergLikeTable, consumer: String,
      maxBatches: Int = Int.MaxValue)(
      process: (DataFrame, BatchInfo) => Unit): Int =
    processAvailableNow(table, consumer, maxBatches, 256)(process)

  /** As above with an explicit initial-load chunk size (leaves per
    * window) — the knob a 100 TB initial mirror tunes.
    */
  def processAvailableNow(table: IcebergLikeTable, consumer: String,
      maxBatches: Int, initialChunkLeaves: Int)(
      process: (DataFrame, BatchInfo) => Unit): Int = {
    val feed = ChangeFeed(table, consumer, initialChunkLeaves)
    var n = 0
    var batch = feed.poll()
    while (batch.isDefined && n < maxBatches) {
      val b = batch.get
      process(b.changes, BatchInfo(b.fromVersion, b.toVersion, b.chunk))
      b.ack()
      n += 1
      batch = feed.poll()
    }
    n
  }

  /** Fold one changelog window into a keyed replica table — as ONE
    * snapshot commit: the window's inserts/update postimages upsert and
    * its deletes ride the same [[IcebergLikeTable.merge]] as key
    * tombstones, so a reader of the target never sees the upserted
    * half without the deletes, and the exactly-once `appendId` mark
    * covers the whole window (no partial-replay crash point). Exposed
    * so custom drains (or replays) can apply windows themselves; see
    * [[mirrorInto]] for the packaged loop. Idempotent under replay:
    * the merge dedupes on `appendId` and orders on `_commit_version`.
    */
  def applyChanges(target: IcebergLikeTable, consumer: String,
      changes: DataFrame, info: BatchInfo): Unit = {
    require(target.uniqueKeys.nonEmpty, "a mirror target needs unique keys")
    val upserts = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
    val deletes = changes
      .filter(col("_change_type") === "delete")
      .select((target.uniqueKeys :+ target.partitionCol :+ "_commit_version")
        .distinct.map(col): _*)
      .distinct()
    target.merge(upserts, deletes, "_commit_version",
      Some((s"mirror:$consumer", info.batchId)))
  }

  /** Maintain `target` as a replica of `source`: drain every pending
    * window through [[applyChanges]]. After a drain that returns,
    * `target.read` equals `source.read` row for row (modulo the
    * `_commit_version` column the changelog stamps). Returns the
    * number of windows applied.
    */
  def mirrorInto(source: IcebergLikeTable, target: IcebergLikeTable,
      consumer: String, maxBatches: Int = Int.MaxValue,
      initialChunkLeaves: Int = 256): Int =
    processAvailableNow(source, consumer, maxBatches, initialChunkLeaves) {
      (changes, info) => applyChanges(target, consumer, changes, info)
    }
}
