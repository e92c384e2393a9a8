/* Bridge into Spark's private[sql] Column↔Expression converters — the
 * standard shim third-party expression libraries use on Spark 4 (the
 * helpers became private with the Connect refactor). Contains no logic.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Raw access to SparkContext.checkpointDir (private[spark]). The public
    * setCheckpointDir(dir) creates a fresh UUID child under `dir` — so
    * "restoring" a saved value via the public setter nests one UUID level
    * deeper (and mkdirs an empty DFS dir) per call, and an originally-unset
    * dir cannot be cleared at all (ADVICE r5). These read/write the field
    * itself, making save → mutate → restore exact.
    */
  def rawCheckpointDir(sc: org.apache.spark.SparkContext): Option[String] =
    sc.checkpointDir

  def setRawCheckpointDir(sc: org.apache.spark.SparkContext,
                          dir: Option[String]): Unit =
    sc.checkpointDir = dir

  /** The session's auto-broadcast budget in bytes (−1 = broadcast
    * disabled), read through the typed `private[sql]` conf accessor so
    * callers don't re-parse the public string form's size units.
    * Operators that force `broadcast()` on a runtime-sized frame (kCore's
    * removal frontier) size their cutoff from THIS, not a constant, so a
    * memory-constrained deployment's threshold is honored (ADVICE r15).
    */
  def autoBroadcastJoinThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf
      .autoBroadcastJoinThreshold

  /** Convert a Column composition into a REAL catalyst expression tree
    * (UnresolvedFunction nodes and all), not the opaque lazy
    * ColumnNodeExpression leaf `expression` yields. Required when the
    * result is handed back to the ANALYZER mid-resolution (SQL function
    * builders in GraftExtensions): the analyzer resolves unresolved
    * functions inside a returned tree on its next fixed-point pass, but it
    * never looks inside an Unevaluable ColumnNodeExpression wrapper.
    */
  def resolvableExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
