package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column <-> Expression converters, so
  * the graft library can expose its native Catalyst expressions through the
  * public Column API. Lives in org.apache.spark.sql purely for access; no
  * Spark internals are modified. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
