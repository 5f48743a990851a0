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
final case class ChangeFeed(table: IcebergLikeTable, name: String,
    initialChunkLeaves: Int = 256) {

  require(name.matches("[A-Za-z0-9_-]+"),
    s"feed name must be [A-Za-z0-9_-]+, got '$name'")
  require(initialChunkLeaves >= 1, "need at least one leaf per chunk")

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
    // content-based cursor file and any initial-load chunk cursors are
    // retired here too — the versioned cursor supersedes them at every
    // crash point.
    prior.filter(_ < v).foreach(p =>
      fs.delete(new Path(root, s"$cursorPrefix$p"), false))
    fs.delete(legacyCursorPath, false)
    chunkCursorFiles().foreach(n => fs.delete(new Path(root, n), false))
  }

  /** Initial-load CHUNK cursors: a cursor-0 feed on a big table drains
    * its initial snapshot as BOUNDED leaf-group windows with per-chunk
    * acks (incremental progress + retry granularity — a 100 TB initial
    * mirror must not be one giant window). The chunk cursor pins the
    * snapshot being loaded and the chunk SIZE the load started with
    * (`.graft_feed_<name>_s<version>_z<size>_c<acked>`), so resuming —
    * even through a handle constructed with a different
    * `initialChunkLeaves` — re-slices the SAME deterministic leaf
    * groups and neither re-delivers nor skips a leaf. Same create-only
    * max-wins publish as the versioned cursor.
    */
  private def chunkPrefix =
    if (table.branch == "main") s".graft_feed_${name}_s"
    else s".graft_feed_${table.branch}@${name}_s"

  private val chunkRe = "_s(\\d+)_z(\\d+)_c(\\d+)$".r

  private def chunkCursorFiles(): Seq[String] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(chunkPrefix) &&
        chunkRe.findFirstIn(n.stripPrefix(chunkPrefix.stripSuffix("_s"))).isDefined)

  /** (pinned version, chunk size, chunks acked) of an in-progress
    * chunked initial load, if any (max-wins across crash leftovers).
    */
  private def chunkCursor: Option[(Long, Int, Int)] =
    chunkCursorFiles().flatMap { n =>
      chunkRe.findFirstMatchIn(n.stripPrefix(chunkPrefix.stripSuffix("_s")))
        .flatMap { m =>
          for {
            l <- m.group(1).toLongOption
            z <- m.group(2).toIntOption
            k <- m.group(3).toIntOption
          } yield (l, z, k)
        }
    }.sorted.lastOption

  private def chunkCursorName(l: Long, z: Int, k: Int): String =
    s"$chunkPrefix${l}_z${z}_c$k"

  private def commitChunkCursor(l: Long, z: Int, k: Int): Unit = {
    val prior = chunkCursorFiles()
    val fin = new Path(root, chunkCursorName(l, z, k))
    val tmp = new Path(root, s"${chunkCursorName(l, z, k)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(Array.emptyByteArray) finally out.close()
    if (!fs.exists(fin) && !fs.rename(tmp, fin))
      throw new java.io.IOException(s"chunk cursor commit failed for feed $name")
    fs.delete(tmp, false)
    prior.filter(_ != chunkCursorName(l, z, k))
      .foreach(n => fs.delete(new Path(root, n), false))
  }

  final case class Batch(fromVersion: Long, toVersion: Long,
      changes: DataFrame, ack: () => Unit,
      chunk: Option[(Int, Int)] = None)

  /** The changes since the committed cursor, or None when the table has
    * no newer snapshot. Call `ack()` after durably processing the batch
    * — it advances the cursor to `toVersion`; never acking re-delivers.
    * A cursor of 0 (new feed) delivers the live table as inserts (the
    * initial load — there is no v0 snapshot to diff from), CHUNKED into
    * windows of at most `initialChunkLeaves` leaf partitions: each
    * chunk is acked independently (`chunk = Some((index, total))`), so
    * a huge initial mirror makes incremental, crash-resumable progress
    * instead of betting one giant window; the pinned snapshot must stay
    * retained for the load's duration (size `retainVersions` to the
    * slowest consumer, as ever). Once the last chunk is acked the feed
    * switches to incremental changes from the pinned version.
    */
  def poll(): Option[Batch] = {
    import org.apache.spark.sql.functions._
    val live = table.currentVersion.getOrElse(return None)
    val from = cursor
    if (from == 0L) return pollInitial(live)
    if (live <= from) return None
    val changes =
      if (table.uniqueKeys.nonEmpty) table.changesBetween(from, live)
      else table.appendsBetween(from, live)
        .withColumn("_change_type", lit("insert"))
    Some(Batch(from, live, changes, () => commitCursor(live)))
  }

  /** The bounded-window initial load. The chunk domain is the PINNED
    * snapshot's sorted leaf list sliced by the PINNED chunk size (both
    * recorded in the chunk cursor at the first ack), so every resume
    * re-derives identical chunks; commits that land mid-load are picked
    * up afterwards as a normal incremental window.
    */
  private def pollInitial(live: Long): Option[Batch] = {
    import org.apache.spark.sql.functions._
    val (pinned, size, done) = chunkCursor.getOrElse((live, initialChunkLeaves, 0))
    val leaves = table.dataLeavesAt(pinned)
    val nChunks = math.max(1, (leaves.size + size - 1) / size)
    if (done >= nChunks) {
      // every chunk acked but the versioned cursor write crashed —
      // finish the promotion, then poll incrementally
      commitCursor(pinned)
      return poll()
    }
    val slice = leaves.slice(done * size, (done + 1) * size).toSet
    val changes = table.readLeavesAt(pinned, slice)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(pinned))
    val ack: () => Unit =
      if (done + 1 >= nChunks) () => commitCursor(pinned)
      else () => commitChunkCursor(pinned, size, done + 1)
    Some(Batch(0L, pinned, changes, ack, Some((done, nChunks))))
  }
}
