package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scale-safe global ranking (rank / dense_rank over the whole frame).
  *
  * `rank().over(Window.orderBy(...))` — an unpartitioned window — moves
  * the ENTIRE input into one partition: the textbook single-task
  * bottleneck, invisible at test scale and fatal at 100 TB. This operator
  * computes the identical result distributed, the same way
  * `RDD.zipWithIndex` does:
  *
  *  1. range-partition on the sort key (`repartitionByRange` — the ONLY
  *     shuffle in the plan; equal keys land in one partition, so ties
  *     never straddle a partition boundary) and sort within partitions;
  *  2. rank locally in a single `mapPartitions` pass (per-partition
  *     imperative logic — a window over `spark_partition_id()` would
  *     plan a second full-frame hash exchange);
  *  3. collect per-partition counts — row counts for `rank`, the max
  *     local dense rank (= distinct keys, null group included) for
  *     `dense_rank` — O(#partitions) longs to the driver, and add each
  *     partition's cumulative offset as a map-literal lookup.
  *
  * Exactly one exchange, never a single-partition one (PlanSpec-pinned);
  * the frame is materialized once via `localCheckpoint` so the offset
  * collection doesn't recompute the input.
  */
object Ranking {

  private val KeyCol = "_rank_key"

  /** The distributed part of the plan: range-partitioned, sorted, ranked
    * per partition in one pass. Exposed for plan tests; `_pid`/`_lr`/
    * `_rank_key` are internal columns.
    */
  private[graft] def localRanked(df: DataFrame, key: Column,
      ascending: Boolean, dense: Boolean): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val withKey = df.withColumn(KeyCol, key)
    val sortExpr = if (ascending) col(KeyCol).asc else col(KeyCol).desc
    val parted = withKey.repartitionByRange(n, sortExpr)
      .sortWithinPartitions(sortExpr)
    val keyIdx = parted.schema.fieldIndex(KeyCol)
    val outSchema = parted.schema.add("_pid", IntegerType).add("_lr", LongType)
    parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rowNum = 0L
      var rank = 0L
      var prev: Any = null
      var first = true
      it.map { row =>
        rowNum += 1
        val k = row.get(keyIdx)
        if (first || !java.util.Objects.equals(k, prev)) {
          rank = if (dense) rank + 1 else rowNum
          prev = k
          first = false
        }
        Row.fromSeq(row.toSeq :+ pid :+ rank)
      }
    }(Encoders.row(outSchema))
  }

  /** `df` plus a global `rank()` (or `dense_rank()` when `dense`) column
    * over `key`, computed without an unpartitioned window. Null keys rank
    * exactly like the window would (nulls group together; asc = nulls
    * first, desc = nulls last).
    */
  def withGlobalRank(df: DataFrame, key: Column, ascending: Boolean,
      rankCol: String, dense: Boolean = false): DataFrame = {
    val local = localRanked(df, key, ascending, dense).localCheckpoint()
    // per-partition contribution to downstream offsets: row count for
    // rank; max local dense rank (= distinct keys incl. the null group)
    // for dense_rank.
    val counts = local.groupBy(col("_pid"))
      .agg((if (dense) max(col("_lr")) else count(lit(1))).as("_n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { case (pid, cnt) =>
      val entry = pid -> acc; acc += cnt; entry
    }.toMap
    val offset =
      if (offsets.isEmpty) lit(0L)
      else coalesce(typedlit(offsets).getItem(col("_pid")), lit(0L))
    local
      .withColumn(rankCol, col("_lr") + offset)
      .drop("_pid", "_lr", KeyCol)
  }
}
