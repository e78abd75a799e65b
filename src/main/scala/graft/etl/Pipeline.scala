package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** O1 — end-to-end pipeline driver
  * (TaxiEtl/TaxiEtl.Application/Services/TripEtlPipelineService.cs:58-194).
  *
  * The reference's per-row pull loop becomes one lazily-planned DataFrame
  * DAG with three consumers: the inserted-rows sink, the duplicates sink,
  * and the stats aggregation. The annotated frame is persisted once
  * (MEMORY_AND_DISK) so the three actions share a single scan+parse+window
  * computation instead of recomputing it — the Spark analog of the
  * reference streaming the file exactly once. At cluster scale the same
  * structure holds; the persist spills to disk instead of OOMing.
  */
object Pipeline {

  /** Build the fully-annotated frame (raw + typed + errors + dup rank)
    * without running anything. */
  def annotate(spark: SparkSession, config: EtlConfig): DataFrame = {
    val raw = CsvSource.read(spark, config.inputCsvPath, config.delimiter)
    val parsed = ParseValidate.parse(raw, config.inputDateTimeFormat)
    val normalized = Normalize.normalize(
      parsed, config.enableTimeZoneConversion, config.inputTimeZoneId)
    Dedup.withFirstWins(normalized)
  }

  /** The sharded scale path: same parse/normalize/dedup stages over a
    * directory/glob of CSV shards, with (src_file, byte_offset) as the
    * file-order ordinal — no global line-number count job (see
    * [[CsvSource.readSharded]]). */
  def annotateSharded(spark: SparkSession, config: EtlConfig): DataFrame = {
    val raw = CsvSource.readSharded(spark, config.inputCsvPath, config.delimiter)
    val parsed = ParseValidate.parse(raw, config.inputDateTimeFormat)
    val normalized = Normalize.normalize(
      parsed, config.enableTimeZoneConversion, config.inputTimeZoneId)
    Dedup.withFirstWins(normalized,
      orderCols = Seq(CsvSource.SrcFileCol, CsvSource.ByteOffsetCol))
  }

  /** Run the full ETL: write inserted rows + duplicates side output, return
    * the six counters. */
  def run(spark: SparkSession, config: EtlConfig): Stats.EtlStats = {
    val annotated = annotate(spark, config).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      Sinks.writeInserted(annotated, config.insertedPath)
      Sinks.writeDuplicates(annotated, config.duplicatesCsvPath)
      Stats.compute(annotated)
    } finally annotated.unpersist()
  }
}
