package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Semi-structured and multimodal column handling.
  *
  * `jsonExtract`: typed extraction from the `events.props` JSON column —
  * `get_json_object` is codegen'd and pushes the scan down to the two
  * referenced columns.
  *
  * `mediaMeta`: multimodal plumbing — treats content as an opaque binary
  * column plus typed metadata, the schema shape a 100 TB image/audio
  * pipeline uses. The DECODE STEP IS A STUB: this container has no image
  * codecs, so "decode" derives deterministic fake dimensions from the byte
  * stream (clearly marked below). The Spark-side structure — binary column,
  * per-row metadata projection, batch-friendly layout — is real and
  * oracle-checked; a real deployment swaps `fakeDecode` for an
  * `mapInArrow`/Pandas-UDF decode over the same binary column.
  */
object JsonMediaOps {

  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val blob = encode(col("text"), "UTF-8") // stand-in media bytes
    val nBytes = length(blob).cast("long")
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      nBytes.as("n_bytes"),
      // --- STUB: deterministic fake decode (no codecs in this container).
      // Real impl: mapInArrow over the binary column, same output schema.
      (nBytes % 640 + 16).as("width"),
      ((nBytes * 31) % 480 + 16).as("height"),
      (floor(nBytes / 256) + 1).cast("long").as("n_frames"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "media_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 31) % 480 + 16 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
