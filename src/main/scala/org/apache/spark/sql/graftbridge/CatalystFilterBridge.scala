package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Package bridge to Spark's own catalyst→V1-filter translation
  * (`DataSourceStrategy.translateFilter` is `protected[sql]`): the
  * engine's metadata-delete fast path converts an analyzed DELETE
  * condition into the exact filter grammar the whole-leaf decision
  * machinery already consumes, using the translation Spark itself
  * pushes scans with — no second, subtly-different translator.
  */
object CatalystFilterBridge {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = false)
}
