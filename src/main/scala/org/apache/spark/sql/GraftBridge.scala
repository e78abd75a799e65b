package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark 4's package-private Column<->Expression
  * conversion (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * register custom Catalyst expressions like graft.functions.VecDot as
  * Columns without a full FunctionRegistry extension. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint()`'d frame.
    *
    * `Dataset.unpersist` routes through the CacheManager and only releases
    * entries registered by persist()/cache(); a local checkpoint persists
    * at the RDD level, so unpersist on the Dataset is a silent no-op and
    * the checkpointed blocks survive until driver GC + ContextCleaner get
    * around to them. Iterative algorithms that checkpoint per round (e.g.
    * connected components) need the eager release — this reaches the
    * LogicalRDD behind the checkpointed frame and unpersists its RDD. */
  def unpersistLocalCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
