package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking (rank / dense_rank over the whole frame).
  *
  * `rank().over(Window.orderBy(...))` — an unpartitioned window — moves
  * the ENTIRE input into one partition: the textbook single-task
  * bottleneck, invisible at test scale and fatal at 100 TB. This operator
  * computes the identical result distributed, the same way
  * `RDD.zipWithIndex` does:
  *
  *  1. range-partition on the sort key (`repartitionByRange` — one narrow
  *     shuffle; equal keys land in one partition, so ties never straddle
  *     a partition boundary);
  *  2. rank locally per partition (`Window.partitionBy(partition id)` —
  *     no further exchange; sort is per-partition);
  *  3. collect per-partition counts — row counts for `rank`, distinct-key
  *     counts for `dense_rank` — O(#partitions) longs to the driver, and
  *     add each partition's cumulative offset as a map-literal lookup.
  *
  * No single-partition exchange appears anywhere in the plan (guarded by
  * PlanSpec); the frame is materialized once via `localCheckpoint` so the
  * offset collection doesn't recompute the input.
  */
object Ranking {

  /** The distributed part of the plan: range-partitioned, locally ranked.
    * Exposed for plan tests; `_pid`/`_lr` are internal columns.
    */
  private[graft] def localRanked(df: DataFrame, key: Column,
      ascending: Boolean, dense: Boolean): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val sortExpr = if (ascending) key.asc else key.desc
    val w = Window.partitionBy(col("_pid")).orderBy(sortExpr)
    df.repartitionByRange(n, sortExpr)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lr", (if (dense) dense_rank() else rank()).over(w))
  }

  /** `df` plus a global `rank()` (or `dense_rank()` when `dense`) column
    * over `key`, computed without an unpartitioned window.
    */
  def withGlobalRank(df: DataFrame, key: Column, ascending: Boolean,
      rankCol: String, dense: Boolean = false): DataFrame = {
    val local = localRanked(df, key, ascending, dense).localCheckpoint()
    val counts = local.groupBy(col("_pid"))
      .agg((if (dense) countDistinct(key) else count(lit(1))).as("_n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // cumulative offset per partition: rows (or distinct keys) in all
    // earlier — strictly better-ranked — partitions.
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { case (pid, cnt) =>
      val entry = pid -> acc; acc += cnt; entry
    }.toMap
    val offset =
      if (offsets.isEmpty) lit(0L)
      else coalesce(typedlit(offsets).getItem(col("_pid")), lit(0L))
    local
      .withColumn(rankCol, col("_lr") + offset)
      .drop("_pid", "_lr")
  }
}
