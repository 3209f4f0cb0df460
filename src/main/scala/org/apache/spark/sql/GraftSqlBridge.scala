package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters — the standard
  * idiom for libraries that define native Catalyst expressions (the public API
  * deliberately hides expression internals; an extension jar re-exports exactly the
  * two conversions it needs). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
