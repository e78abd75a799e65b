package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded edit distance: the exact Levenshtein distance when it is
  * ≤ `bound`, else -1 — with the bound as a PER-ROW column expression.
  *
  * Spark's own 3-arg `levenshtein(l, r, threshold)` runs a banded DP
  * (Ukkonen): O(len·bound) cells instead of the full O(len²) table,
  * plus an O(1) short-circuit when `|len(a)-len(b)| > bound` (the
  * distance is at least the length difference). But its threshold is a
  * literal — useless for fuzzy matching, where the cutoff is a fraction
  * of the LONGER text and so differs per pair. This expression delegates
  * to the same engine-tested kernel
  * (`UTF8String.levenshteinDistance(other, threshold)`) with the bound
  * evaluated per row, and stays inside whole-stage codegen (a one-line
  * call on already-materialized UTF8Strings, the VecDot pattern).
  *
  * Exactness contract: for any pair whose true distance is within the
  * bound the returned value IS the full Levenshtein distance — so
  * filtering on `result != -1` is bit-identical to computing the full
  * DP and filtering `dist <= bound`, and the DuckDB oracle (full
  * `levenshtein` + threshold predicate) is unchanged. */
case class LevenshteinWithin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  // inputs are strings + an int bound by construction (see the wrapper)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_within"

  override def nullSafeEval(a: Any, b: Any, bound: Any): Any =
    a.asInstanceOf[UTF8String].levenshteinDistance(
      b.asInstanceOf[UTF8String], bound.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b, t) => s"${ev.value} = $a.levenshteinDistance($b, $t);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LevenshteinWithin =
    copy(newFirst, newSecond, newThird)
}

object TextDistanceFunctions {
  /** Levenshtein distance of `a` and `b` if ≤ `bound` (per-row int
    * column), else -1. */
  def levenshteinWithin(a: Column, b: Column, bound: Column): Column =
    GraftBridge.column(LevenshteinWithin(
      GraftBridge.expression(a.cast("string")),
      GraftBridge.expression(b.cast("string")),
      GraftBridge.expression(bound.cast("int"))))
}
