package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated harness tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory at call time so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench)
  * — and, on a real cluster, at any path. Parquet scans give Catalyst
  * column pruning + predicate pushdown for free; nothing here should
  * ever force a full materialization.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = t(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects by default; read it as a long and convert to a microsecond
    * TimestampType with exact integer division (a double-based division
    * would lose ulps at 1e18 ns). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
