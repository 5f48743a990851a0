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
  * changes into a keyed target — upserts for inserts/update
  * postimages (ordered by `_commit_version`, so a replayed older
  * window can never clobber newer rows), key deletes for deletes —
  * with the upsert carrying the exactly-once mark. Cost per drain is
  * O(changed leaves) on the source (the changelog diff) plus
  * O(affected leaves) on the target (the merge), never O(table).
  *
  * Scale note: the delete step materializes the window's deleted KEYS
  * on the driver to build the point predicate (the same bounded-point
  * posture as [[MaterializedAgg]]'s group lookup) — fine for the
  * CDC-sized windows this consumes; a backfill-scale delete should run
  * as its own batch job instead.
  */
object TableStream {

  /** One drained micro-batch's coordinates: the (from, to] version
    * window and the batch id (= `toVersion`) a dedup-capable sink
    * should key on.
    */
  final case class BatchInfo(fromVersion: Long, toVersion: Long) {
    def batchId: Long = toVersion
  }

  /** Drain the feed until the consumer is caught up (Trigger
    * .AvailableNow over table versions): polls, hands each window to
    * `process`, acks, repeats — up to `maxBatches` windows. Returns the
    * number of windows processed. A `process` that throws leaves the
    * cursor unacked, so the next drain re-delivers the same window.
    */
  def processAvailableNow(table: IcebergLikeTable, consumer: String,
      maxBatches: Int = Int.MaxValue)(
      process: (DataFrame, BatchInfo) => Unit): Int = {
    val feed = ChangeFeed(table, consumer)
    var n = 0
    var batch = feed.poll()
    while (batch.isDefined && n < maxBatches) {
      val b = batch.get
      process(b.changes, BatchInfo(b.fromVersion, b.toVersion))
      b.ack()
      n += 1
      batch = feed.poll()
    }
    n
  }

  /** Fold one changelog window into a keyed replica table. Exposed so
    * custom drains (or replays) can apply windows themselves; see
    * [[mirrorInto]] for the packaged loop. Idempotent under replay:
    * the upsert dedupes on `appendId`, the merge orders on
    * `_commit_version`, and re-deleting absent keys is a no-op.
    */
  def applyChanges(target: IcebergLikeTable, consumer: String,
      changes: DataFrame, info: BatchInfo): Unit = {
    require(target.uniqueKeys.nonEmpty, "a mirror target needs unique keys")
    val upserts = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
    val deletes = changes
      .filter(col("_change_type") === "delete")
      .select(target.uniqueKeys.map(col): _*)
      .distinct()
    target.upsert(upserts, "_commit_version",
      Some((s"mirror:$consumer", info.batchId)))
    val deletedKeys = deletes.collect()
    if (deletedKeys.nonEmpty) {
      val pred = deletedKeys.toSeq.map { r =>
        // null-safe per-column equality: a NULL key component must
        // match its stored NULL, not silently never-match
        target.uniqueKeys.map(k => col(k) <=> lit(r.getAs[Any](k)))
          .reduce(_ && _)
      }.reduce(_ || _)
      target.delete(pred)
    }
  }

  /** Maintain `target` as a replica of `source`: drain every pending
    * window through [[applyChanges]]. After a drain that returns,
    * `target.read` equals `source.read` row for row (modulo the
    * `_commit_version` column the changelog stamps). Returns the
    * number of windows applied.
    */
  def mirrorInto(source: IcebergLikeTable, target: IcebergLikeTable,
      consumer: String, maxBatches: Int = Int.MaxValue): Int =
    processAvailableNow(source, consumer, maxBatches) { (changes, info) =>
      applyChanges(target, consumer, changes, info)
    }
}
