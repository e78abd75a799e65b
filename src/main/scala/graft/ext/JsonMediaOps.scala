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
  * `mediaMeta`: multimodal columns as first-class data — content as an
  * opaque binary column plus typed metadata, the schema shape a 100 TB
  * image/audio pipeline uses. Blobs are REAL container files (byte-correct
  * PNG / BMP / WAV, rotating per doc_id; see [[graft.functions.MediaBytes]])
  * synthesized from the document text, and the decode step genuinely
  * parses the headers back out of the bytes (magic-number dispatch,
  * endianness-correct fixed-offset reads). The oracle predicts the same
  * metadata arithmetically from the synthesis parameters, so a decode that
  * misreads any header byte hash-fails. Both steps are codegen'd native
  * expressions — one scan, no shuffle, no Python round-trip.
  */
object JsonMediaOps {

  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("blob",
        graft.functions.MediaFunctions.synthMedia(col("doc_id"), col("text")))
      .withColumn("meta",
        graft.functions.MediaFunctions.mediaHeaderDecode(col("blob")))
      .select(
        col("doc_id"),
        col("meta.format").as("format"),
        length(col("blob")).cast("long").as("n_bytes"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.n_frames").as("n_frames"))
      .orderBy("doc_id")

  val oracles: Map[String, String] = Map(
    "json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    // Predicts the decode output from the synthesis parameters: format by
    // doc_id mod 3, sizes = payload + container overhead (45/54/44), image
    // dims from payload length, wav frames = payload / blockAlign(2).
    "media_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS format,
        |  CAST(octet_length(encode(text))
        |    + CASE doc_id % 3 WHEN 0 THEN 45 WHEN 1 THEN 54 ELSE 44 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |    ELSE octet_length(encode(text)) % 640 + 16 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |    ELSE (octet_length(encode(text)) * 31) % 480 + 16 END AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) // 2
        |    ELSE 1 END AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
