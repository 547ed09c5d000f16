package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column <-> Expression converters.
  *
  * Spark 4 hides the classic Expression constructors behind
  * `private[sql] classic.ExpressionUtils`; custom Catalyst expressions (the
  * documented extension path) still need to surface as `Column`s. This shim
  * lives in the org.apache.spark.sql package solely to re-export those two
  * conversions — the standard technique used by Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
