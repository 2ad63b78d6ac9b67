package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters so custom
  * Catalyst expressions (graft.functions._) can be exposed as Columns.
  * Lives in the spark.sql package purely for access; no Spark internals
  * are modified. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
