package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so library code can
  * materialize a DataFrame from a custom LogicalPlan — the standard
  * pattern for OSS Spark extension libraries (a helper object inside the
  * org.apache.spark.sql package). No Spark internals are modified.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 Columns wrap ColumnNodes). */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst Expression → Column — for expressions that exist in
    * Catalyst but are not exposed in the public function registry
    * (e.g. BloomFilterMightContain, registered only for Spark's internal
    * runtime-filter rewrite).
    */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
