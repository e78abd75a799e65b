package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts of the media container plumbing: the payload
  * locator must find the payload region from the BYTES of each container
  * (the decode contract — not a formula on row values), and the histogram
  * must count exactly the payload, not the headers. Pure JVM, no Spark. */
class MediaBytesSpec extends AnyFunSuite {

  private val payload = "hello media payload!".getBytes("UTF-8")

  private def histOf(blob: Array[Byte]): Seq[Long] = {
    val a = MediaBytes.payloadHist(blob)
    (0 until a.numElements()).map(a.getLong)
  }

  private def expected(p: Array[Byte]): Seq[Long] = {
    val h = new Array[Long](16)
    p.foreach(b => h((b & 0xff) % 16) += 1)
    h.toSeq
  }

  test("payload offset located from bytes for all three containers") {
    assert(MediaBytes.payloadOffset(MediaBytes.png(33, 44, payload)) ==
      MediaBytes.PngOverhead)
    assert(MediaBytes.payloadOffset(MediaBytes.bmp(33, 44, payload)) ==
      MediaBytes.BmpOverhead) // read from the header at byte 10, not assumed
    assert(MediaBytes.payloadOffset(MediaBytes.wav(payload)) ==
      MediaBytes.WavOverhead)
    assert(MediaBytes.payloadOffset("garbage".getBytes("UTF-8")) == -1)
  }

  test("histogram counts exactly the payload bytes, headers excluded") {
    for (blob <- Seq(MediaBytes.png(33, 44, payload),
        MediaBytes.bmp(33, 44, payload), MediaBytes.wav(payload))) {
      assert(histOf(blob) == expected(payload))
      assert(histOf(blob).sum == payload.length.toLong)
    }
    // unknown container degrades to all-zero, like the decode step
    assert(histOf("not a container".getBytes("UTF-8")) == Seq.fill(16)(0L))
  }

  test("dhash: format-invariant, edit-local on the quantized grid, degrades to 0") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(400)((32 + rnd.nextInt(95)).toByte) // printable ASCII
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // the hash is over the payload region: identical payloads in
    // DIFFERENT containers hash identically (cross-format dedup)
    val hPng = MediaBytes.dhash64(MediaBytes.png(33, 44, base))
    val hBmp = MediaBytes.dhash64(MediaBytes.bmp(33, 44, base))
    val hWav = MediaBytes.dhash64(MediaBytes.wav(base))
    assert(hPng == hBmp && hBmp == hWav)
    // a small trailing append lands within the precision-tuned banding
    // threshold (the quantized grid: 400 and 404 bytes share segment
    // width 8, so only the touched segments' gradients can flip)
    val t = graft.ext.JsonMediaOps.MediaHammingMax
    val appended = base ++ " dup".getBytes("UTF-8")
    assert(ham(hPng, MediaBytes.dhash64(MediaBytes.wav(appended))) <= t)
    // ... and a mid-stream byte substitution too
    val sub = base.clone(); sub(200) = 'Z'.toByte
    assert(ham(hPng, MediaBytes.dhash64(MediaBytes.png(33, 44, sub))) <= t)
    // an unrelated payload of the same length is far away
    val other = Array.fill(400)((32 + rnd.nextInt(95)).toByte)
    assert(ham(hPng, MediaBytes.dhash64(MediaBytes.wav(other))) > t)
    // unknown container and empty payload degrade to 0, never throw
    assert(MediaBytes.dhash64("not a container".getBytes("UTF-8")) == 0L)
    assert(MediaBytes.dhash64(MediaBytes.wav(Array.empty[Byte])) == 0L)
  }
}
