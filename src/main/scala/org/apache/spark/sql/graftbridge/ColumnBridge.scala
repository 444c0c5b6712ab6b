package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to the `private[sql]` Column⇄Expression converters.
  *
  * Spark 4's Column API is backend-agnostic (Connect vs classic) and no
  * longer exposes a public Column-from-Expression constructor; extension
  * libraries shipping native Catalyst expressions reach the classic
  * converters from inside the `org.apache.spark.sql` namespace. This is
  * the only file in the project that lives outside `graft`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
