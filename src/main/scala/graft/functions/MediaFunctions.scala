package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real multimodal byte plumbing: container synthesis and header decode.
  *
  * The north-star brief asks for image/audio/video as opaque binary
  * columns with a REAL decode step. This container has no codec
  * libraries, but container *headers* need none: PNG (RFC 2083 signature
  * + IHDR chunk incl. CRC32), BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  * little-endian), and WAV (RIFF/WAVE/fmt/data, little-endian) are all
  * fixed-offset binary structures. `synth` builds byte-correct files
  * (valid magic, sizes, CRCs) carrying the document text as the opaque
  * payload; `decode` parses format, dimensions and frame count back out
  * of the BYTES — a real parse that fails on corrupt input, not a
  * formula on row values.
  *
  * Both steps are native codegen'd Catalyst expressions (the Scala-side
  * equivalent of the Python `mapInPandas` decode shape the brief
  * sketches): per-row byte work stays in the JVM inside whole-stage
  * codegen, one scan, no shuffle, no Python round-trip.
  */
object MediaBytes {

  /** Header overhead per container, used by the DuckDB oracle to predict
    * blob sizes arithmetically. */
  val PngOverhead = 8 + 25 + 12 // signature + IHDR chunk + IEND chunk
  val BmpOverhead = 14 + 40     // BITMAPFILEHEADER + BITMAPINFOHEADER
  val WavOverhead = 44          // RIFF + fmt + data chunk headers

  /** Deterministic container synthesis: format rotates by doc_id mod 3,
    * image dims derive from the payload length (so the oracle can predict
    * them without parsing bytes). Payload is the raw text bytes — an
    * opaque carrier, not a rendered raster; the decode contract is the
    * header, exactly like a truncated real-world file. */
  def synth(docId: Long, text: UTF8String): Array[Byte] = {
    val payload = text.getBytes
    val n = payload.length
    val width = n % 640 + 16
    val height = (n * 31) % 480 + 16
    (docId % 3) match {
      case 0 => png(width, height, payload)
      case 1 => bmp(width, height, payload)
      case _ => wav(payload)
    }
  }

  /** Byte-correct PNG: signature, IHDR (width/height big-endian, 8-bit
    * truecolor) with a valid CRC32, IEND, then the opaque payload. */
  def png(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(PngOverhead + payload.length) // big-endian
    out.put(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
    val ihdr = ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(13).put(ihdr.array())
    val crc = new CRC32(); crc.update(ihdr.array())
    out.putInt(crc.getValue.toInt)
    out.putInt(0).put("IEND".getBytes("US-ASCII"))
    val crc2 = new CRC32(); crc2.update("IEND".getBytes("US-ASCII"))
    out.putInt(crc2.getValue.toInt)
    out.put(payload)
    out.array()
  }

  /** Byte-correct 24bpp BMP: BITMAPFILEHEADER + BITMAPINFOHEADER
    * (little-endian), payload as the pixel-array region. */
  def bmp(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(BmpOverhead + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(BmpOverhead + payload.length) // file size
    out.putInt(0)                            // reserved
    out.putInt(BmpOverhead)                  // pixel-array offset
    out.putInt(40)                           // info-header size
    out.putInt(w).putInt(h)
    out.putShort(1).putShort(24)             // planes, bpp
    out.putInt(0).putInt(payload.length)     // compression, image size
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    out.put(payload)
    out.array()
  }

  /** Byte-correct PCM WAV: mono, 16-bit, 16 kHz; payload is the data
    * chunk, so n_frames = payload / blockAlign(2). */
  def wav(payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(WavOverhead + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(1)       // PCM, mono
    out.putInt(16000).putInt(32000)   // sample rate, byte rate
    out.putShort(2).putShort(16)      // block align, bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(payload.length)
    out.put(payload)
    out.array()
  }

  /** Payload offset per container, from the BYTES (the real locate step:
    * PNG payload follows the fixed signature+IHDR+IEND prefix, BMP's
    * pixel-array offset is read from the file header at byte 10, WAV's
    * data chunk follows the 44-byte RIFF prefix). −1 = unknown format. */
  def payloadOffset(blob: Array[Byte]): Int =
    if (blob.length >= 24 && (blob(0) & 0xff) == 0x89 &&
        blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G') PngOverhead
    else if (blob.length >= 26 && blob(0) == 'B' && blob(1) == 'M')
      ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN).getInt(10)
    else if (blob.length >= 44 && blob(0) == 'R' && blob(1) == 'I' &&
        blob(2) == 'F' && blob(3) == 'F') WavOverhead
    else -1

  /** 16-bucket payload byte histogram (bucket = unsigned byte mod 16),
    * computed over the container's payload region located by
    * [[payloadOffset]] — the feature-extract step of the cross-modal
    * path: a cheap, deterministic content signature derived from the
    * BYTES (the decode contract), not from row values. Unknown formats
    * yield the all-zero histogram. */
  def payloadHist(blob: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val hist = new Array[Long](16)
    val off = payloadOffset(blob)
    if (off >= 0) {
      var i = off
      while (i < blob.length) { hist((blob(i) & 0xff) % 16) += 1; i += 1 }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hist)
  }

  /** Number of gradient segments in [[dhash64]] — 64 bits need 65
    * segment means. Shared with the DuckDB oracle's replay. */
  val DhashSegments = 65

  /** 64-bit difference-hash (dHash) over the container's payload region
    * — the perceptual-hash shape image dedup runs (downsample, then
    * gradient sign bits), applied to the payload signal: bytes are
    * bucketed into [[DhashSegments]] fixed-width segments (segment of
    * byte i = i div w — the integer-exact "resize"), and bit b is set
    * iff segment b's MEAN byte value exceeds segment b+1's. Means are
    * compared by cross-multiplication (sum_b·cnt_{b+1} > sum_{b+1}·cnt_b)
    * so the whole hash stays on the integer grid — exactly replayable
    * from the synthesis parameters (payload = the text bytes) by the
    * oracle.
    *
    * The segment width w is the smallest power of two with 65·w ≥ n — a
    * QUANTIZED canonical grid, not the proportional i·65 div n split: a
    * proportional grid moves every boundary when the length changes by
    * one byte, so a trailing 4-byte append flipped ~18 bits on the
    * harness near-dups (measured); on the quantized grid near-equal
    * lengths share w, boundaries are aligned from byte 0, and a small
    * edit perturbs only the segments it touches (same pairs: ≤ 2 bits).
    * The residual trade: a pair whose lengths straddle a w doubling
    * gets different grids and is missed — the banding-recall analog of
    * the winnow df-cap trade. Unknown formats and empty payloads hash
    * to 0 (all gradients flat), mirroring [[decode]]'s
    * degrade-don't-throw stance. */
  def dhash64(blob: Array[Byte]): Long = {
    val off = payloadOffset(blob)
    if (off < 0) return 0L
    val n = blob.length - off
    if (n <= 0) return 0L
    val x = (n + DhashSegments - 1) / DhashSegments
    val w = if (x <= 1) 1 else Integer.highestOneBit(x - 1) << 1
    gradientHash(blob, off, n, w)
  }

  /** DENSE-grid variant of [[dhash64]]: w = ⌈n / 65⌉ exactly, no
    * power-of-two rounding. The quantized grid's length-leak is the
    * empty tail — for n just past a doubling boundary almost half the
    * segments sit beyond the payload, their gradient bits constant zero
    * (measured set-rates on the harness corpus: bits 32–63 at
    * 0.47→0.008), which wastes half the signature and forces banding
    * onto the low 32 bits. The minimal-w grid leaves at most
    * ⌊(w·65−n)/w⌋ ≤ 64/w trailing segments empty (≤ 8 at the harness
    * payload sizes, 0 when 65 | n), so ~56+ bits carry signal and bands
    * can sit anywhere in the low 48.
    *
    * The edit-tolerance trade moves, not disappears: boundaries are
    * still aligned from byte 0 and w is shared by near-equal lengths,
    * but w now changes every 65 bytes of length drift instead of every
    * doubling — so a trailing append loses the pair iff it crosses a
    * 65·k length boundary (probability ≈ edit/65 vs ≈ edit/n before).
    * Same integer-exact arithmetic, replayed bit-for-bit by the
    * oracle's CTE with `w = (n + 64) // 65`. */
  def dhashDense64(blob: Array[Byte]): Long = {
    val off = payloadOffset(blob)
    if (off < 0) return 0L
    val n = blob.length - off
    if (n <= 0) return 0L
    gradientHash(blob, off, n, (n + DhashSegments - 1) / DhashSegments)
  }

  /** Shared gradient-bit kernel of the two dHash grids: fixed-width
    * segments of `w` bytes, bit b = sign of the mean difference between
    * segments b and b+1, compared by cross-multiplication so the hash
    * stays on the integer grid. */
  private def gradientHash(blob: Array[Byte], off: Int, n: Int, w: Int): Long = {
    val sums = new Array[Long](DhashSegments)
    val cnts = new Array[Long](DhashSegments)
    var i = 0
    while (i < n) {
      val s = i / w
      sums(s) += blob(off + i) & 0xff
      cnts(s) += 1
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) * cnts(b + 1) > sums(b + 1) * cnts(b)) h |= 1L << b
      b += 1
    }
    h
  }

  /** Header parse: (format, width, height, n_frames) from the BYTES.
    * Magic-number dispatch, then fixed-offset reads in the container's
    * own endianness. Unknown/corrupt input degrades to ("unknown",0,0,0)
    * instead of throwing — at 100 TB some blobs are always damaged. */
  def decode(blob: Array[Byte]): InternalRow = {
    def r(f: String, w: Int, h: Int, fr: Long): InternalRow =
      new GenericInternalRow(Array[Any](UTF8String.fromString(f), w, h, fr))
    if (blob.length >= 24 && (blob(0) & 0xff) == 0x89 &&
        blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G') {
      val bb = ByteBuffer.wrap(blob) // PNG ints are big-endian
      r("png", bb.getInt(16), bb.getInt(20), 1L)
    } else if (blob.length >= 26 && blob(0) == 'B' && blob(1) == 'M') {
      val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
      r("bmp", bb.getInt(18), bb.getInt(22), 1L)
    } else if (blob.length >= 44 && blob(0) == 'R' && blob(1) == 'I' &&
        blob(2) == 'F' && blob(3) == 'F' && blob(8) == 'W' &&
        blob(9) == 'A' && blob(10) == 'V' && blob(11) == 'E') {
      val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
      val blockAlign = bb.getShort(32).toLong max 1L
      r("wav", 0, 0, bb.getInt(40).toLong / blockAlign)
    } else r("unknown", 0, 0, 0L)
  }
}

/** `synth_media(doc_id, text)` → binary. Codegen is a single static-shaped
  * call into [[MediaBytes]] — no interpretation overhead, and the byte
  * assembly itself is intrinsically imperative (the legitimate use of a
  * helper method over inline codegen). */
case class SynthMedia(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_media"

  override def nullSafeEval(id: Any, text: Any): Any =
    MediaBytes.synth(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, t) =>
      s"${ev.value} = graft.functions.MediaBytes$$.MODULE$$.synth($id, $t);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SynthMedia = copy(newLeft, newRight)
}

/** `media_header_decode(blob)` → struct<format,width,height,n_frames>. */
case class MediaHeaderDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))
  override def prettyName: String = "media_header_decode"

  override def nullSafeEval(b: Any): Any =
    MediaBytes.decode(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaBytes$$.MODULE$$.decode($b);")

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderDecode =
    copy(newChild)
}

/** `media_payload_hist(blob)` → array<bigint> of 16 byte-bucket counts
  * over the container's payload region. */
case class MediaPayloadHist(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "media_payload_hist"

  override def nullSafeEval(b: Any): Any =
    MediaBytes.payloadHist(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaBytes$$.MODULE$$.payloadHist($b);")

  override protected def withNewChildInternal(newChild: Expression): MediaPayloadHist =
    copy(newChild)
}

/** `media_dhash(blob)` → bigint: the 64-bit payload difference-hash
  * ([[MediaBytes.dhash64]]). */
case class MediaDhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "media_dhash"

  override def nullSafeEval(b: Any): Any =
    MediaBytes.dhash64(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaBytes$$.MODULE$$.dhash64($b);")

  override protected def withNewChildInternal(newChild: Expression): MediaDhash =
    copy(newChild)
}

/** `media_dhash_dense(blob)` → bigint: the dense-grid payload
  * difference-hash ([[MediaBytes.dhashDense64]]). */
case class MediaDhashDense(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "media_dhash_dense"

  override def nullSafeEval(b: Any): Any =
    MediaBytes.dhashDense64(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaBytes$$.MODULE$$.dhashDense64($b);")

  override protected def withNewChildInternal(newChild: Expression): MediaDhashDense =
    copy(newChild)
}

object MediaFunctions {
  def synthMedia(docId: Column, text: Column): Column =
    GraftBridge.column(SynthMedia(
      GraftBridge.expression(docId.cast("long")),
      GraftBridge.expression(text)))

  def mediaHeaderDecode(blob: Column): Column =
    GraftBridge.column(MediaHeaderDecode(GraftBridge.expression(blob)))

  def mediaPayloadHist(blob: Column): Column =
    GraftBridge.column(MediaPayloadHist(GraftBridge.expression(blob)))

  def mediaDhash(blob: Column): Column =
    GraftBridge.column(MediaDhash(GraftBridge.expression(blob)))

  def mediaDhashDense(blob: Column): Column =
    GraftBridge.column(MediaDhashDense(GraftBridge.expression(blob)))
}
