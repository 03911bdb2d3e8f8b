package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` representation-
  * agnostic and hid the conversions behind `private[sql]`
  * (classic.ExpressionUtils); custom Catalyst expressions that expose a
  * `Column` API need this one-file residency in the sql package — the
  * standard extension-library pattern.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
