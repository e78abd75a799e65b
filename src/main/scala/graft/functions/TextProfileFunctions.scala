package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-profile character-trigram occurrence counts over a string, as ONE
  * native codegen pass — the language-ID scorer.
  *
  * Why a native expression: the HOF formulation (`transform(sequence(...))`
  * building the gram array, then one `size(filter(...))` per language)
  * embeds the full gram-array computation into every score column AND every
  * branch of the argmax CASE at construction time — ~14 interpreted
  * evaluations of a text-sized array per document (measured 8.99 s vs
  * 0.19 s at sf0.1 for the confusion-matrix consumer; the same
  * interpreted-HOF re-inlining trap as [[WinnowFingerprint]], see PERF.md).
  * Here the whole scorer is a single deterministic expression, so
  * whole-stage codegen's subexpression elimination evaluates it once per
  * row no matter how many columns consume it.
  *
  * Semantics (pinned for cross-engine replay — identical to the HOF form
  * and to the DuckDB oracle's
  * `len(list_filter(grams, g -> g IN (...)))`):
  *  - grams are the code-point trigrams `substring(t, i, 3)` for
  *    i in 1..len(t)-2 (len in code points); texts shorter than 3 code
  *    points score 0 everywhere;
  *  - counts include multiplicity (every matching position counts);
  *  - a trigram present in several profiles counts toward each.
  *
  * Implementation: each trigram packs its 3 code points (≤ 21 bits each)
  * into one long; matching is a binary search over the sorted packed keys
  * with a per-key profile bitmask — O(len · log |profiles·k|) per row, no
  * allocation beyond the output array.
  */
case class TrigramProfileScores(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {
  require(profiles.nonEmpty && profiles.size <= 64,
    s"1..64 profiles supported, got ${profiles.size}")
  profiles.flatten.foreach { t =>
    require(t.codePointCount(0, t.length) == 3,
      s"profile trigram must be exactly 3 code points: '$t'")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_profile_scores"

  @transient private lazy val tables: (Array[Long], Array[Long]) =
    TrigramProfileScores.buildTables(profiles)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TrigramProfileScores.score(
      input.asInstanceOf[UTF8String], tables._1, tables._2, profiles.size))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val keysRef = ctx.addReferenceObj("tpsKeys", tables._1, "long[]")
      val masksRef = ctx.addReferenceObj("tpsMasks", tables._2, "long[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TrigramProfileScores.score(
         |    $c, $keysRef, $masksRef, ${profiles.size}));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TrigramProfileScores =
    copy(child = newChild)
}

object TrigramProfileScores {

  private def pack(c0: Int, c1: Int, c2: Int): Long =
    (c0.toLong << 42) | (c1.toLong << 21) | c2.toLong

  /** Sorted packed trigram keys + parallel per-key profile bitmasks. */
  private[functions] def buildTables(profiles: Seq[Seq[String]])
      : (Array[Long], Array[Long]) = {
    val byKey = scala.collection.mutable.LongMap.empty[Long]
    profiles.zipWithIndex.foreach { case (tris, p) =>
      tris.foreach { t =>
        val c0 = t.codePointAt(0)
        val i1 = t.offsetByCodePoints(0, 1)
        val c1 = t.codePointAt(i1)
        val c2 = t.codePointAt(t.offsetByCodePoints(i1, 1))
        val k = pack(c0, c1, c2)
        byKey.update(k, byKey.getOrElse(k, 0L) | (1L << p))
      }
    }
    val keys = byKey.keys.toArray.sorted
    (keys, keys.map(byKey))
  }

  /** One pass over the string's code points with a rolling 3-gram window.
    * Public because the generated code calls it.
    *
    * Decodes code points straight from the UTF8String's UTF-8 bytes —
    * the earlier `s.toString` paid one String allocation PLUS a full
    * UTF-8→UTF-16 transcode per document before scoring began (micro-
    * bench, 10⁶ ~150-char mixed-script docs, one thread: ~980 ns/doc vs
    * ~1460 ns/doc, ~1.5×; counts bit-identical on every doc, oracle
    * hashes unchanged). For valid UTF-8 the decoded sequence is
    * identical to `String.codePointAt` iteration; Spark strings are
    * UTF-8 by construction — but not GUARANTEED valid (casts from
    * binary, corrupt sources), and `UTF8String.getByte` is unchecked
    * over a possibly shared row buffer, so malformed input is handled
    * in-bounds: a truncated multi-byte tail, a stray lead byte, a lead
    * whose trailing bytes aren't continuations (each checked for the
    * 10xxxxxx pattern before acceptance), an overlong encoding (C0/C1
    * leads, E0 A0-/F0 90- second bytes), a UTF-16 surrogate (ED A0+),
    * or a code point past U+10FFFF (F4 90+, F5..F7 leads) decodes as
    * U+FFFD and advances one byte, deterministic and never reading past
    * `numBytes`. The set of ACCEPTED sequences is exactly Unicode's
    * well-formed table (what Java's decoder accepts); on rejected input
    * the policy is one U+FFFD per rejected byte, which can differ from
    * Java's maximal-subpart grouping in replacement COUNT (e.g. a
    * truncated `E2 82` tail is two U+FFFD here, one in Java) but never
    * in which byte sequences decode to real code points. */
  def score(s: UTF8String, keys: Array[Long], masks: Array[Long],
      nProfiles: Int): Array[Long] = {
    val counts = new Array[Long](nProfiles)
    val n = s.numBytes()
    var i = 0
    var p2 = -1 // code point two back
    var p1 = -1 // previous code point
    // a trailing byte of a multi-byte sequence must be 10xxxxxx; masking
    // with & 0x3F UNchecked would let e.g. C3 41 decode to U+00C1 and
    // swallow the 'A' — the documented contract (malformed → U+FFFD,
    // advance ONE byte) requires validating each continuation byte.
    @inline def cont(j: Int): Boolean = (s.getByte(j) & 0xC0) == 0x80
    // the SECOND byte's legal range depends on the lead (Unicode 15 §3.7
    // table of well-formed sequences): E0 excludes overlong A0-, ED
    // excludes surrogates A0+, F0 excludes overlong 90-, F4 excludes
    // > U+10FFFF 90+ — so overlong encodings, UTF-16 surrogates (ED A0
    // 80 would be U+D800), and out-of-range code points (F4 90 80 80)
    // all reject to U+FFFD instead of decoding to the forbidden value
    @inline def contIn(j: Int, lo: Int, hi: Int): Boolean = {
      val b = s.getByte(j) & 0xFF; b >= lo && b <= hi
    }
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 >= 0xC2 && b0 <= 0xDF && i + 1 < n && cont(i + 1)) {
        // C0/C1 leads are overlong by construction — excluded above
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < n &&
          contIn(i + 1, if (b0 == 0xE0) 0xA0 else 0x80,
            if (b0 == 0xED) 0x9F else 0xBF) && cont(i + 2)) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); i += 3
      } else if (b0 >= 0xF0 && b0 <= 0xF4 && i + 3 < n &&
          contIn(i + 1, if (b0 == 0xF0) 0x90 else 0x80,
            if (b0 == 0xF4) 0x8F else 0xBF) &&
          cont(i + 2) && cont(i + 3)) {
        // F5..F7 leads (code points past U+10FFFF) fall through to FFFD
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); i += 4
      } else {
        // malformed: stray continuation, invalid/overlong/out-of-range
        // lead, truncated tail, surrogate or overlong second byte, or a
        // lead whose trailing bytes aren't continuations
        cp = 0xFFFD; i += 1
      }
      if (p2 >= 0) {
        val idx = java.util.Arrays.binarySearch(
          keys, (p2.toLong << 42) | (p1.toLong << 21) | cp.toLong)
        if (idx >= 0) {
          var m = masks(idx)
          while (m != 0L) {
            counts(java.lang.Long.numberOfTrailingZeros(m)) += 1L
            m &= m - 1L
          }
        }
      }
      p2 = p1
      p1 = cp
    }
    counts
  }
}

object TextProfileFunctions {
  /** Per-profile trigram occurrence counts (array<long>, one element per
    * profile) over a string column — see [[TrigramProfileScores]]. */
  def trigramProfileScores(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftBridge.column(TrigramProfileScores(
      GraftBridge.expression(text.cast("string")), profiles))
}
