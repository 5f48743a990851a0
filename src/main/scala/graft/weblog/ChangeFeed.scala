package graft.weblog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Pull-based change-data-capture consumer over an [[IcebergLikeTable]]
  * — the generic "follow this table" primitive under
  * [[MaterializedAgg]]'s specialized refresh: each `poll()` returns the
  * row-level changes between the consumer's committed cursor and the
  * live snapshot, plus an `ack` that durably advances the cursor ONLY
  * when the consumer calls it — at-least-once delivery with
  * consumer-controlled commit, the Kafka-consumer contract over table
  * snapshots:
  *
  *   - crash BEFORE ack → the next poll re-delivers the same window
  *     (no change lost);
  *   - ack exactly at the end of processing → each window is processed
  *     effectively once;
  *   - multiple independent consumers follow the same table under
  *     different names, each with its own cursor file.
  *
  * The cursor is one version number in a consumer-named file beside the
  * table (`.graft_feed_<name>`), written via hidden-tmp + rename (the
  * same publish pattern as the manifests). Changes come from
  * [[IcebergLikeTable.changesBetween]] (leaf-pruned, O(changed
  * leaves)) or [[IcebergLikeTable.appendsBetween]] for key-less
  * tables; a cursor older than the retention window fails the poll
  * with the changelog's own expired-snapshot error — size
  * `retainVersions` to the slowest consumer, exactly as with Iceberg's
  * incremental reads.
  */
final case class ChangeFeed(table: IcebergLikeTable, name: String) {

  require(name.matches("[A-Za-z0-9_-]+"),
    s"feed name must be [A-Za-z0-9_-]+, got '$name'")

  private def root = new Path(table.path)
  private def fs = root.getFileSystem(table.spark.sparkContext.hadoopConfiguration)
  private def cursorPath = new Path(root, s".graft_feed_$name")

  /** The committed cursor: the source version this feed has acked
    * through (0 = from the beginning).
    */
  def cursor: Long =
    if (!fs.exists(cursorPath)) 0L
    else {
      val in = fs.open(cursorPath)
      val bytes = try in.readAllBytes() finally in.close()
      // a torn/corrupt cursor file degrades to a full re-delivery (the
      // at-least-once direction), never a crash or a skipped window
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .trim.toLongOption.getOrElse(0L)
    }

  private def commitCursor(v: Long): Unit = {
    val tmp = new Path(root, s".graft_feed_$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(cursorPath, false)
    if (!fs.rename(tmp, cursorPath))
      throw new java.io.IOException(s"cursor commit failed for feed $name")
  }

  final case class Batch(fromVersion: Long, toVersion: Long,
      changes: DataFrame, ack: () => Unit)

  /** The changes since the committed cursor, or None when the table has
    * no newer snapshot. Call `ack()` after durably processing the batch
    * — it advances the cursor to `toVersion`; never acking re-delivers.
    * A cursor of 0 (new feed) delivers the whole live table as inserts
    * (the initial load — there is no v0 snapshot to diff from).
    */
  def poll(): Option[Batch] = {
    import org.apache.spark.sql.functions._
    val live = table.currentVersion.getOrElse(return None)
    val from = cursor
    if (live <= from) return None
    val changes =
      if (from == 0L)
        table.read.withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(live))
      else if (table.uniqueKeys.nonEmpty) table.changesBetween(from, live)
      else table.appendsBetween(from, live)
        .withColumn("_change_type", lit("insert"))
    Some(Batch(from, live, changes, () => commitCursor(live)))
  }
}
