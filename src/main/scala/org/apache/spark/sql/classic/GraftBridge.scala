package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the package-private Column↔Expression converters —
  * the supported path for third-party Catalyst expressions since the
  * Spark 4 Column API became backend-agnostic. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
