package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two array<double> columns as
  * a tight codegen'd loop.
  *
  * Why a custom Expression (SURVEY §7.3 reserved this escape hatch for
  * exactly this case): the built-in alternatives both fail at scale —
  * `zip_with`+`aggregate` is a higher-order function and evaluates
  * interpreted, and an unrolled 64-term `element_at` sum is a ~130-node
  * expression tree that exceeds predicate codegen limits when it lands in
  * a join condition, silently falling back to interpreted eval (measured
  * ~21 µs/pair → 85 s for the sf0.1 pair join; the loop form runs the
  * same join in seconds). A compact loop survives codegen anywhere the
  * expression is placed.
  *
  * Accumulation order is the same left fold as the built-in `aggregate`
  * fold, so results are bit-identical to the HOF formulation.
  *
  * Null elements inside the arrays are not supported (embedding vectors
  * are dense); mismatched lengths use the shorter prefix.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always wrapped with an explicit cast to array<double> by
  // VectorFunctions.vecDot, so no ExpectsInputTypes machinery is needed
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot = copy(newLeft, newRight)
}

object VectorFunctions {
  /** Dot product over two vector columns (any numeric array type; cast to
    * array<double> first so accumulation is double-precision). */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
