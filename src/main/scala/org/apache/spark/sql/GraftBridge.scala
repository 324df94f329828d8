package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * pattern for libraries that ship custom Catalyst expressions (the public
  * API intentionally hides the Expression constructor since Spark 4's
  * Column-node refactor).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
