package graft.weblog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table (materialized view) over an
  * [[IcebergLikeTable]] source: a keyed summary — group dimensions →
  * COUNT plus additive SUMs, the self-maintainable aggregate class —
  * refreshed from the source's CDC instead of rescanned.
  *
  * `refresh()` reads ONLY `changesBetween(cursor, live)` (leaf-pruned:
  * O(changed leaves), never O(source)); folds the change rows into
  * per-group deltas (+1/+value for inserts and update postimages,
  * −1/−value for deletes and update preimages); joins the deltas
  * against the CURRENT target rows of the affected groups only (a
  * [[IcebergLikeTable.readWhere]]-prunable point set, bounded by the
  * delta's distinct groups); and upserts the new absolute rows.
  *
  * The refresh CURSOR is the source snapshot version, recorded through
  * the target's own exactly-once append mark (`appendId = (source
  * identity, source version)`) — committed ATOMICALLY with the derived
  * rows, so a crash between refresh and any external bookkeeping
  * cannot double-apply: re-running the same refresh resolves
  * `version <= hwm` and is skipped, and the next refresh resumes from
  * the committed cursor. This is exactly Iceberg's
  * incremental-processing recipe (consume a snapshot range, record the
  * consumed watermark in the derived table's snapshot).
  *
  * Scale: refresh cost is O(changed rows + affected groups), never
  * O(source) and never O(view) — a 100 TB fact table with a key-local
  * commit refreshes its rollup by reading a handful of leaves and
  * rewriting the touched group rows' leaves.
  */
final case class MaterializedAgg(
    source: IcebergLikeTable,
    target: IcebergLikeTable,
    groupCols: Seq[String],
    sumCols: Seq[String] = Nil,
    countCol: String = "cnt") {

  require(groupCols.nonEmpty, "a materialized aggregate needs group columns")
  require(target.uniqueKeys == groupCols,
    s"target unique keys ${target.uniqueKeys} must equal the group columns $groupCols")

  private def cursorId: String = s"matview:${source.path}"

  /** The source version this view has folded in (None = never refreshed). */
  def refreshedThrough: Option[Long] = target.appendHighWaterMark(cursorId)

  private def sumName(c: String): String = s"sum_$c"

  /** Fold source changes since the last refresh into the target.
    * Returns the (from, to] source-version window applied, or None when
    * the source has no newer snapshot. `partitionValue` is the target's
    * partition-column value for new group rows (the view is usually
    * single-partition; pass a column-derived value via the group cols
    * when it is not).
    */
  /** Above this many affected groups the refresh joins the full view
    * instead of a point-pruned read (the adaptive point: a huge refresh
    * is closer to a rebuild anyway).
    */
  private val PointLookupGroups = 1000

  /** The affected-group point predicate for a small delta: turns the
    * current-values join and the zero-count cleanup into
    * stats/bloom-prunable point reads instead of view scans.
    * Multi-column groups use the per-column membership CONJUNCTION —
    * each column restricted to the delta's values for it: a superset
    * of the exact tuple set (the cross product), which is sound for
    * both uses — the current-values join still matches exactly on the
    * null-safe group equality, and the cleanup delete can only remove
    * count-0 rows, which are invisible housekeeping whichever group
    * they belong to — while staying a shape the per-file bounds and
    * bloom stamps can prune on every column independently. NULL is a
    * legal group value (groupBy keeps a null group) and `isin` can
    * never match it, so membership tests it explicitly. None when the
    * delta exceeds [[PointLookupGroups]] (a huge refresh is closer to
    * a rebuild; scan the view instead).
    */
  private[weblog] def affectedGroupPredicate(deltas: DataFrame): Option[Column] = {
    val g = deltas.select(groupCols.map(col): _*).limit(PointLookupGroups + 1)
      .collect()
    if (g.length > PointLookupGroups) None
    else Some(groupCols.zipWithIndex.map { case (c, i) =>
      val vals = g.map(_.get(i)).distinct.toSeq
      val (nulls, values) = vals.partition(_ == null)
      val base =
        if (values.isEmpty) lit(false)
        else col(c).isin(values: _*)
      if (nulls.isEmpty) base else base || col(c).isNull
    }.reduce(_ && _))
  }

  def refresh(partitionValue: String = "all"): Option[(Long, Long)] = {
    val live = source.currentVersion.getOrElse(return None)
    val from = refreshedThrough.getOrElse(0L)
    if (live <= from) return None

    // the initial materialization is necessarily a full scan (there is
    // no snapshot v0 to diff from); every later refresh reads only the
    // changed leaves
    val changes =
      if (from == 0L) source.read.withColumn("_change_type", lit("insert"))
      else if (source.uniqueKeys.nonEmpty) source.changesBetween(from, live)
      else source.appendsBetween(from, live)
        .withColumn("_change_type", lit("insert"))
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltaAggs = sum(sign).as("_dcnt") +:
      sumCols.map(c => sum(sign * coalesce(col(c), lit(0))).as(s"_d_${sumName(c)}"))
    // cached: the delta frame is consumed up to three times (group
    // collect, merge, upsert) and is small — O(affected groups)
    val deltas = changes
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .persist()

    val groupPred: Option[Column] =
      if (target.currentVersion.isEmpty) None
      else affectedGroupPredicate(deltas)

    val merged =
      if (target.currentVersion.isEmpty)
        deltas.select(
          groupCols.map(col) ++
            (col("_dcnt").as(countCol) +:
              sumCols.map(c => col(s"_d_${sumName(c)}").as(sumName(c)))): _*)
      else {
        // null-safe equality per group column: an equi-join would never
        // match a null-key group, read its current count as 0, and
        // overwrite the absolute row with the delta alone
        val cur = groupPred.map(target.readWhere).getOrElse(target.read)
          .select((groupCols.map(c => col(c).as(s"_cur_$c")) :+
            col(countCol).as(s"_cur_$countCol")) ++
            sumCols.map(c => col(sumName(c)).as(s"_cur_${sumName(c)}")): _*)
        val on = groupCols.map(c => col(c) <=> col(s"_cur_$c")).reduce(_ && _)
        deltas.join(cur, on, "left_outer")
          .select(
            groupCols.map(col) ++
              ((coalesce(col(s"_cur_$countCol"), lit(0L)) + col("_dcnt")).as(countCol) +:
                sumCols.map(c =>
                  (coalesce(col(s"_cur_${sumName(c)}"), lit(0L)) + col(s"_d_${sumName(c)}"))
                    .as(sumName(c)))): _*)
      }
    val rows = merged
      .withColumn(target.partitionCol, lit(partitionValue))
      .withColumn("_seq", lit(live))
    try target.upsert(rows, "_seq", Some((cursorId, live)))
    finally deltas.unpersist()
    // groups whose count folded to zero left the source entirely —
    // only possible on keyed sources (appends never retract), and only
    // among the affected groups, so the erase scan is scoped when the
    // point predicate is available. This delete is a SEPARATE commit
    // from the cursor-bearing upsert; a crash between the two leaves
    // count-0 rows behind (the replayed refresh is skipped by the
    // high-water mark), which is why [[read]] filters them out — the
    // zero rows are representational housekeeping, never user-visible.
    if (source.uniqueKeys.nonEmpty) {
      val zero = col(countCol) === 0L
      target.delete(groupPred.map(_ && zero).getOrElse(zero))
    }
    Some((from, live))
  }

  /** The view as a DataFrame (group cols + count + sums). Count-0 rows
    * — groups that left the source, retained only if a crash separated
    * the refresh commit from its cleanup delete — are filtered here, so
    * `read` equals [[fullRecompute]] even inside that crash window.
    */
  def read: DataFrame = target.read.drop(target.partitionCol).drop("_seq")
    .filter(col(countCol) =!= 0L)

  /** Ground-truth twin: the same aggregate recomputed from the full
    * source scan (spec/gate comparison surface).
    */
  def fullRecompute: DataFrame = {
    val aggs = count(lit(1)).as(countCol) +:
      sumCols.map(c => sum(coalesce(col(c), lit(0))).as(sumName(c)))
    source.read.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
