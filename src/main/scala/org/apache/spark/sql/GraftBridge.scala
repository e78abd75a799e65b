package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark 4's package-private Column<->Expression
  * conversion (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * register custom Catalyst expressions like graft.functions.VecDot as
  * Columns without a full FunctionRegistry extension. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
