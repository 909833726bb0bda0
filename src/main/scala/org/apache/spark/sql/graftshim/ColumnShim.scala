package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst [[Expression]]s and public [[Column]]s.
  * `ExpressionUtils` is `private[sql]`, so this lives under
  * `org.apache.spark.sql` — the one place graft code touches Spark
  * internals' package-private API surface.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
