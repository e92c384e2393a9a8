package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Session extension: exposes the engine's native expressions to SQL users
  * (`spark.sql.extensions=graft.GraftExtensions` →
  * `SELECT graft_dot(a, b)`). The DataFrame API reaches the same
  * expressions directly (Similarity.dot), so the injection is for SQL
  * parity, not a separate code path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(l, r) => DotProduct(l, r)
        case other => throw new IllegalArgumentException(
          s"graft_dot expects exactly 2 arguments, got ${other.size}")
      }))
  }
}
