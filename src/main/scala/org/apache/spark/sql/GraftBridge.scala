/* Bridge into Spark's private[sql] Column↔Expression converters — the
 * standard shim third-party expression libraries use on Spark 4 (the
 * helpers became private with the Connect refactor). Contains no logic.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
