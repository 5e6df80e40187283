package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversions.
  *
  * Spark 4 made `Column` a thin wrapper over a connect-compatible
  * `ColumnNode`; libraries adding native Catalyst expressions go
  * through `classic.ExpressionUtils`, which is `private[sql]` — hence
  * this one-file shim living in the `org.apache.spark.sql` package
  * (the standard pattern used by Spark-native libraries).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — `Dataset.ofRows` is
    * `private[sql]`, the supported seam for libraries adding custom
    * logical operators. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
