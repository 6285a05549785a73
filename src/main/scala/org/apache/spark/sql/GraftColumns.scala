package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ⇄ Expression converters —
  * the standard pattern for libraries that ship custom Catalyst
  * expressions without forcing every SparkSession to be built with
  * extension registration (graft's driver contract hands us sessions we
  * didn't construct). Nothing else from the private surface is touched.
  */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
