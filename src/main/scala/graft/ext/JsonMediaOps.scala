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

  /** Metadata-level media TRANSFORM planning — the resize / frame-sample
    * step of an image/audio pipeline, expressed over the decoded headers
    * (the pixel/sample work itself needs codec libraries this container
    * lacks; the Spark-side plumbing — decode, integer-exact thumbnail
    * arithmetic, even frame sampling, schema — is the real and tested
    * part): aspect-preserving thumbnail dims capped at 64 on the long
    * side (integer div, so cross-engine exact) and up to 8 evenly-strided
    * sampled frame indices. One scan, codegen'd, no shuffle. */
  def mediaTransform(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("blob",
        graft.functions.MediaFunctions.synthMedia(col("doc_id"), col("text")))
      .withColumn("meta",
        graft.functions.MediaFunctions.mediaHeaderDecode(col("blob")))
      .withColumn("w", col("meta.width").cast("long"))
      .withColumn("h", col("meta.height").cast("long"))
      .withColumn("nf", col("meta.n_frames"))
      .withColumn("mx", greatest(col("w"), col("h")))
      .select(
        col("doc_id"),
        col("meta.format").as("format"),
        when(col("mx") <= 64, col("w")) // audio (0x0) passes through here
          .otherwise(greatest(lit(1L), expr("w * 64 div mx"))).as("thumb_w"),
        when(col("mx") <= 64, col("h"))
          .otherwise(greatest(lit(1L), expr("h * 64 div mx"))).as("thumb_h"),
        col("nf").as("n_frames"),
        when(col("nf") <= 0, lit(""))
          .otherwise(concat_ws(",", expr(
            "transform(sequence(0L, nf - 1, (nf + 7) div 8), x -> CAST(x AS STRING))")))
          .as("sampled_frames"))
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
    // Same synthesis-parameter prediction, then the transform arithmetic
    // replayed in integer SQL: thumbnail = aspect-preserving integer
    // scale-down to 64 on the long side; frames = up to 8 evenly strided.
    "media_transform" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS format,
        |    CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |      ELSE octet_length(encode(text)) % 640 + 16 END AS BIGINT) AS w,
        |    CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |      ELSE (octet_length(encode(text)) * 31) % 480 + 16 END AS BIGINT) AS h,
        |    CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) // 2
        |      ELSE 1 END AS BIGINT) AS nf
        |  FROM documents
        |)
        |SELECT doc_id, format,
        |  CASE WHEN greatest(w, h) <= 64 THEN w
        |       ELSE greatest(1, w * 64 // greatest(w, h)) END AS thumb_w,
        |  CASE WHEN greatest(w, h) <= 64 THEN h
        |       ELSE greatest(1, h * 64 // greatest(w, h)) END AS thumb_h,
        |  nf AS n_frames,
        |  CASE WHEN nf <= 0 THEN ''
        |       ELSE array_to_string([CAST(x AS VARCHAR)
        |                             FOR x IN range(0, nf, (nf + 7) // 8)], ',')
        |  END AS sampled_frames
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
