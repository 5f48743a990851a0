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

  /** Cursor files are CHAIN-scoped: a feed follows one version chain,
    * so a branch-handle feed and a main feed with the same name must
    * keep independent cursors ('@' separates chain from name — it is in
    * neither charset, so the scoping is injective).
    */
  private def cursorPrefix =
    if (table.branch == "main") s".graft_feed_${name}_v"
    else s".graft_feed_${table.branch}@${name}_v"

  /** The cursor is encoded in the FILE NAME (`.graft_feed_<name>_v<n>`),
    * and a commit CREATES the new name before deleting older ones — a
    * delete-then-rename onto one fixed name would have a crash window
    * with NO readable cursor, re-delivering the entire table from
    * version 0 (and double-counting for consumers that fold
    * increments). Here every crash point leaves at least the previous
    * cursor file on disk, and `cursor` reads the max.
    */
  private def cursorVersions: Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(cursorPrefix))
      .flatMap(_.stripPrefix(cursorPrefix).toLongOption)
      .sorted

  /** The pre-versioned cursor format: one file named
    * `.graft_feed_<name>` whose CONTENT is the acked version. Read as a
    * fallback when no versioned cursor exists (an upgraded feed must
    * not restart from version 0 and re-deliver / double-count the whole
    * table); deleted once the first versioned cursor is durable.
    */
  private def legacyCursorPath =
    new Path(root, cursorPrefix.stripSuffix("_v"))

  private def legacyCursor: Option[Long] =
    if (!fs.exists(legacyCursorPath)) None
    else {
      val in = fs.open(legacyCursorPath)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      s.trim.toLongOption
    }

  /** The committed cursor: the source version this feed has acked
    * through (0 = from the beginning).
    */
  def cursor: Long =
    cursorVersions.lastOption.orElse(legacyCursor).getOrElse(0L)

  private def commitCursor(v: Long): Unit = {
    val prior = cursorVersions
    val fin = new Path(root, s"$cursorPrefix$v")
    // hidden-tmp + rename to a fresh (per-version) name: the rename
    // target never pre-exists, so no overwrite semantics are needed
    val tmp = new Path(root, s"$cursorPrefix$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(Array.emptyByteArray) finally out.close()
    if (!fs.exists(fin) && !fs.rename(tmp, fin))
      throw new java.io.IOException(s"cursor commit failed for feed $name")
    fs.delete(tmp, false)
    // housekeeping AFTER the new cursor is durable; a crash here leaves
    // extra files whose max is still the right cursor. The legacy
    // content-based cursor file is retired here too — the versioned
    // cursor now supersedes it at every crash point.
    prior.filter(_ < v).foreach(p =>
      fs.delete(new Path(root, s"$cursorPrefix$p"), false))
    fs.delete(legacyCursorPath, false)
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
