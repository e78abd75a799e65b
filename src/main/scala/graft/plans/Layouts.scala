package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
