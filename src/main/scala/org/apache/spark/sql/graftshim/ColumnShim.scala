package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst internals and the public API surface.
  * `ExpressionUtils` and `Dataset.ofRows` are `private[sql]`, so this
  * lives under `org.apache.spark.sql` — the one place graft code touches
  * Spark internals' package-private API surface.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (analyzed) logical plan as an executable DataFrame — used by
    * the SQL top-k batch rewrite to run a query-side sub-plan at plan
    * time. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
