package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic

/** Package bridge to two `private[sql]` session facilities that
  * [[graft.operators.Checkpoints.withIterationPlanning]] needs for
  * CONF-ISOLATED iterative loops (r16):
  *
  *  - `classic.SparkSession.cloneSession()` — a child session sharing
  *    the SparkContext (and its cached/checkpointed RDDs) but with its
  *    OWN copy of the session state, so loop-scoped conf overrides
  *    (AQE off, loop-sized shuffle partitions) never leak into queries
  *    planned concurrently on the caller's session. The public
  *    `newSession()` is not enough: it starts from blank state instead
  *    of inheriting the caller's confs/extensions.
  *  - `classic.Dataset.ofRows` — re-binds a DataFrame's logical plan to
  *    another session, so loop entry frames (already checkpointed
  *    `LogicalRDD`s — session-independent leaves) plan under the loop
  *    session and the loop result re-attaches to the caller's session.
  */
object SessionBridge {
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    classic.Dataset.ofRows(to.asInstanceOf[classic.SparkSession],
      df.queryExecution.logical)
}
