package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` helpers for Column ↔ catalyst Expression
  * conversion (Spark 4 moved `Column` to a ColumnNode representation; the
  * classic converters live behind `private[sql]`). Standard technique for
  * libraries shipping custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
