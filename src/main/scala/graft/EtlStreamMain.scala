package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.etl.{CsvSource, EtlConfig}
import graft.streaming.StreamingOps

/** Streaming CLI for the taxi ETL: watches a directory of headerless
  * delimited files (canonical 9-column order), runs the same
  * parse/normalize expressions as the batch pipeline with
  * first-arrival-wins dedup, and writes trips parquet continuously.
  *
  * Usage: EtlStreamMain <inputDir> <outputDir> [--follow]
  * Without --follow, processes everything currently available and exits
  * (Trigger.AvailableNow).
  */
object EtlStreamMain {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, outputDir, rest @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-etl-stream")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val colIdx = CsvSource.RequiredColumns.zipWithIndex.toMap
    val trips = StreamingOps.taxiEtlStream(
      spark.readStream.text(inputDir),
      EtlConfig(inputCsvPath = inputDir, duplicatesCsvPath = "",
        insertedPath = outputDir),
      colIdx)
    val writer = trips.writeStream
      .format("parquet")
      .option("path", s"$outputDir/trips")
      .option("checkpointLocation", s"$outputDir/checkpoint")
    val q =
      if (rest.contains("--follow")) writer.start()
      else writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.read.parquet(s"$outputDir/trips").count()
    println(s"""{"streamed_trips":$n}""")
    spark.stop()
  }
}
