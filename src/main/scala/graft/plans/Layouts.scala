package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Physical data layout — the Spark analog of the reference's index DDL
  * (TaxiEtl/script.sql:55-97). SQL Server uses B-tree indexes; a Spark
  * warehouse gets the same query properties from layout:
  *
  *  - `writePartitionedBy`: hive-style partition directories. A filter on
  *    the partition column becomes partition PRUNING (whole directories
  *    skipped at planning time) — the analog of the reference's
  *    IX_Trips_PULocation seek for Q4-style point queries. At 100 TB this
  *    is the difference between scanning one key's slice and the world.
  *  - `writeBucketedTable`: pre-shuffled, co-located layout on the join /
  *    dedup key. Two tables bucketed on the same key with the same bucket
  *    count join WITHOUT a shuffle — the standing answer to "this join's
  *    exchange is the bottleneck at scale".
  */
object Layouts {

  def writePartitionedBy(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def writeBucketedTable(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — shuffle-free by
    * construction. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Bits per dimension for [[zorderValue]] (16+16 → one positive
    * 32-bit z-value in a long). Shared with the `zorder_keys` oracle. */
  val ZBits = 16

  /** Z-order (Morton) interleave of two dimensions — the clustering key
    * behind multi-dimensional data skipping (Delta OPTIMIZE ZORDER,
    * Iceberg sort orders). Sorting/range-partitioning 100 TB by a single
    * column gives tight min/max file ranges on THAT column only; sorting
    * by the interleaved key gives useful ranges on BOTH dimensions at
    * once, so a 2-d box predicate prunes files on either column.
    *
    * Each dimension is first folded into [[ZBits]] bits with a
    * non-negative mod (callers bucketize real values to ints); the
    * interleave itself is a fixed fan of shift/mask/or terms — pure
    * projection, whole-stage codegen, no shuffle. */
  def zorderValue(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftBridge.column(zorderExpr(
      org.apache.spark.sql.GraftBridge.expression(x),
      org.apache.spark.sql.GraftBridge.expression(y)))

  /** The same interleave as a raw Catalyst expression tree — shared by
    * the Column wrapper above and the `zorder_value` SQL registration in
    * GraftExtensions (a Column-composed tree cannot be injected as a SQL
    * function: it carries unresolved ColumnNode wrappers). */
  def zorderExpr(x: Expression, y: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{
      BitwiseAnd, BitwiseOr, Cast, Literal, Pmod, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    val m = 1L << ZBits
    val xm = Pmod(Cast(x, LongType), Literal(m))
    val ym = Pmod(Cast(y, LongType), Literal(m))
    (0 until ZBits).foldLeft(Literal(0L): Expression) { (acc, i) =>
      BitwiseOr(
        BitwiseOr(acc,
          ShiftLeft(BitwiseAnd(xm, Literal(1L << i)), Literal(i))),
        ShiftLeft(BitwiseAnd(ym, Literal(1L << i)), Literal(i + 1)))
    }
  }

  /** The same interleave as ANSI SQL for the DuckDB oracle (generated
    * from the same constants, so the two sides cannot drift). */
  def zorderSql(xExpr: String, yExpr: String): String = {
    val m = 1L << ZBits
    // DuckDB (Postgres-style) gives &, |, << EQUAL precedence, left-
    // associative — every term must be fully parenthesized or the ors
    // re-associate into the shifts
    val terms = (0 until ZBits).flatMap { i =>
      Seq(s"(((((($xExpr) % $m + $m) % $m) & ${1L << i})) << $i)",
        s"(((((($yExpr) % $m + $m) % $m) & ${1L << i})) << ${i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }
}
