package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's Column↔Expression conversion (ExpressionUtils is
  * private[sql], so third-party expression libraries need an in-package
  * shim — the standard pattern for Catalyst extensions). */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
