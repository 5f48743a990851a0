package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package bridge to `classic.ExpressionUtils.column` (`private[sql]`):
  * wraps one of the engine's native Catalyst expressions as a `Column`
  * WITHOUT a function-registry round-trip. Column-level helper
  * functions (e.g. `Dedup.hashedNgramsAll`) have no SparkSession in
  * scope to register a temp function against, and threading one
  * through every call site just to name an expression the session
  * never needs by name would be registration for registration's sake.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
