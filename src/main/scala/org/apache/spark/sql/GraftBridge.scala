package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column ↔ Expression converters, which are private[sql]
  * in Spark 4 (columnNodeSupport). Declared inside the sql package so
  * library code (graft.functions) can wrap custom Catalyst expressions as
  * Columns — the supported pattern for third-party expression libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
