package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two `array<double>` columns.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`,
  * graft.operators.Similarity.dot) allocates an intermediate array and
  * evaluates a lambda per element outside whole-stage codegen. This
  * expression generates a primitive loop (`doGenCode`) that fuses into the
  * surrounding codegen stage — the preference ladder's tier (b): a native
  * Catalyst Expression, used only where built-ins are genuinely slower
  * (the ANN distance kernels, §7.5).
  *
  * Semantics match the HOF version bit-for-bit: left-to-right
  * multiply-accumulate in IEEE double over min(len(a), len(b)) elements.
  * A null element in the accumulated prefix yields NULL, exactly like the
  * HOF chain (zip_with's x*y is null, aggregate's acc+null is null) — a
  * silent 0 would skew similarity rankings instead of surfacing bad data
  * (ADVICE r03).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // the result can be null through null ELEMENTS even when both array
  // children are non-nullable, so this must not inherit child nullability
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // explicit check instead of ExpectsInputTypes (private[sql] in Spark 4):
  // no implicit float→double coercion, callers cast arrays explicitly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
