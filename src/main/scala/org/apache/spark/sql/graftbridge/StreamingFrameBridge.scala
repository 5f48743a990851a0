package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` touchpoint a V1 streaming `Source` needs:
  * `getBatch` must return a DataFrame whose logical plan is flagged
  * `isStreaming` (MicroBatchExecution asserts it), and the only
  * constructor for such a frame is the session's internal one. This is
  * the standard connector bridge — Delta Lake's streaming source makes
  * the identical call from its own org.apache.spark.sql subpackage. No
  * other internals are touched.
  */
object StreamingFrameBridge {
  def streamingFrame(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)

  def emptyStreamingFrame(spark: SparkSession, schema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }

  /** The V1 `Sink.addBatch` twin of [[streamingFrame]]: the DataFrame a
    * sink receives is an incrementalized streaming frame whose plan
    * cannot be re-planned into the batch writes a table commit runs
    * (self-union/dedup inside one trigger mis-binds; Spark's own
    * ForeachBatchSink re-wraps for the same reason). Re-rooting the
    * already-computed InternalRow RDD as a BATCH frame gives the commit
    * path an ordinary DataFrame without materializing on the driver.
    * Rows are unsafe-row buffers reused by the scan — copy before
    * re-rooting.
    */
  def batchFrame(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows.map(_.copy()), schema,
        isStreaming = false)

  /** Wrap a Catalyst expression as a user-facing Column (the SQL DML
    * bridge converts resolved UPDATE/MERGE expressions to run against
    * the engine's own frames; `classic.ExpressionUtils` is
    * `private[sql]`).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** A DataFrame over an already-analyzed logical plan (the captured
    * MERGE source).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
