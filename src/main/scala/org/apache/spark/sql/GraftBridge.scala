package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`) private[sql],
  * so extension libraries host this one-liner inside the sql package —
  * the same pattern third-party Spark connector/function libraries use.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
