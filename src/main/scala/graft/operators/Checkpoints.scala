package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative DataFrame operators ([[Graph]], [[Markov]],
  * [[Dedup.clusters]]): each iteration must truncate the growing plan or
  * the optimizer re-analyzes an exponentially deeper tree every round.
  *
  * Two implementations, selected per session:
  *  - default: eager `localCheckpoint` — blocks live in executor
  *    storage. Fastest, and correct on `local[*]`; on a real cluster a
  *    lost executor loses blocks whose lineage was truncated, failing
  *    the job (Spark cannot recompute past a localCheckpoint).
  *  - `spark.graft.checkpoint.reliable=true`: reliable `checkpoint()` to
  *    the configured checkpoint directory
  *    (`SparkContext.setCheckpointDir`, an HDFS/S3 path on a cluster) —
  *    executor loss replays from durable storage, the posture a
  *    1000-executor run wants. Same results, same plans downstream (both
  *    cuts scan a materialized RDD); CheckpointSpec pins that.
  *
  * Storage note for the reliable path: Spark deletes reliable
  * checkpoint data only when `spark.cleaner.referenceTracking
  * .cleanCheckpoints=true` (set it at session build — it cannot change
  * at runtime) AND the RDD is GC'd; otherwise each iteration leaves one
  * durable copy of its working frame under the checkpoint dir. Long-
  * running drivers should set the cleaner conf or point the dir at a
  * storage-lifecycle-managed path (e.g. an S3 prefix with expiry).
  */
object Checkpoints {

  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Cut `df`'s lineage eagerly via the session-selected mechanism. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (!reliable) df.localCheckpoint(true)
    else {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires SparkContext.setCheckpointDir " +
          "(a durable cluster path, e.g. on HDFS/S3)")
      df.checkpoint(true)
    }
  }
}
