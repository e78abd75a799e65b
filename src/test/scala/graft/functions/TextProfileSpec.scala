package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TrigramProfileScores]] — the single-pass native lang-ID scorer —
  * pinned against the HOF formulation it replaced (the semantics the
  * DuckDB oracle replays) and against hand-computed edge cases. */
class TextProfileSpec extends SparkSpec {

  import spark.implicits._

  private val profiles = Seq(
    Seq(" th", "the", "he ", " an", "nd ", "ing"),
    Seq("der", "ie ", "und", "ch ", "ein", "sch"),
    Seq("aaa"), // lhs==rhs-style overlap: multiplicity counting
    Seq("the", "und")) // shared trigrams count toward every profile

  test("matches the HOF reference (size(filter(grams, in set))) exactly") {
    val texts = Seq(
      "the quick brown fox and the lazy dog jumping",
      "der hund und die katze in der schule",
      "aaaaaa", // 4 overlapping 'aaa' positions
      "ab", // shorter than a trigram: all zeros
      "", // empty
      "the und the und", // cross-profile shared grams
      "naïve café über schön") // non-ASCII BMP code points
    val df = texts.toDF("text")
      .withColumn("sc", TextProfileFunctions.trigramProfileScores(
        lower(col("text")), profiles))
    val grams = expr(
      """CASE WHEN length(t) < 3 THEN array()
        |ELSE transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) END"""
        .stripMargin)
    val ref = texts.toDF("text").withColumn("t", lower(col("text")))
      .select(profiles.zipWithIndex.map { case (tris, i) =>
        size(filter(grams, g => g.isInCollection(tris))).cast("long").as(s"r$i")
      }: _*)
    val got = df.select(profiles.indices.map(i => col("sc").getItem(i)): _*)
      .collect().map(_.toSeq)
    val want = ref.collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("malformed UTF-8 decodes in-bounds as U+FFFD: truncated tails, stray bytes") {
    import org.apache.spark.unsafe.types.UTF8String
    val (keys, masks) = TrigramProfileScores.buildTables(profiles)
    def sc(bytes: Array[Byte]): Seq[Long] = TrigramProfileScores
      .score(UTF8String.fromBytes(bytes), keys, masks, profiles.size).toSeq
    // a truncated multi-byte tail decodes exactly like an explicit
    // U+FFFD — the valid prefix's counts are preserved
    assert(sc("and the ".getBytes("UTF-8") :+ 0xE4.toByte) ==
      sc("and the �".getBytes("UTF-8")))
    // stray continuation byte mid-string
    assert(sc("th".getBytes("UTF-8") ++ Array(0x80.toByte) ++
        "e and ".getBytes("UTF-8")) ==
      sc("th�e and ".getBytes("UTF-8")))
    // pure garbage: stray continuation, truncated 3- and 4-byte leads,
    // invalid lead — decodes to replacement chars, never out of bounds
    assert(sc(Array(0x80, 0xE4, 0xF0, 0xFF).map(_.toByte)) ==
      Seq.fill(profiles.size)(0L))
    assert(sc(Array(0xE4.toByte)) == Seq.fill(profiles.size)(0L))
    // a lead whose trailing byte is NOT a continuation must not swallow
    // it: C3 41 ('A') decodes as U+FFFD then 'A' — the 'A' stays visible
    // to the trigram window (unchecked & 0x3F masking would fuse them
    // into U+00C1 and desynchronize every following gram)
    assert(sc(Array(0xC3.toByte) ++ "and the ".getBytes("UTF-8")) ==
      sc("�and the ".getBytes("UTF-8")))
    // same for 3- and 4-byte leads with valid length but bad trails
    assert(sc(Array(0xE4.toByte) ++ "the and ".getBytes("UTF-8")) ==
      sc("�the and ".getBytes("UTF-8")))
    assert(sc(Array(0xF0.toByte) ++ "the and ".getBytes("UTF-8")) ==
      sc("�the and ".getBytes("UTF-8")))
  }

  test("overlong / surrogate / out-of-range sequences reject to U+FFFD; " +
      "well-formed boundary sequences still decode") {
    import org.apache.spark.unsafe.types.UTF8String
    // a trigram of three replacement chars makes replacement MULTIPLICITY
    // observable: k rejected bytes -> k U+FFFDs -> k-2 overlapping matches,
    // while a (wrongly) accepted sequence is ONE code point -> 0 matches
    val p = Seq(Seq("���"))
    val (keys, masks) = TrigramProfileScores.buildTables(p)
    def m(bytes: Int*): Long = TrigramProfileScores.score(
      UTF8String.fromBytes(bytes.map(_.toByte).toArray), keys, masks, 1)(0)
    assert(m(0xED, 0xA0, 0x80) == 1L)       // surrogate U+D800: 3 FFFDs
    assert(m(0xED, 0x9F, 0xBF) == 0L)       // U+D7FF: valid, one cp
    assert(m(0xEE, 0x80, 0x80) == 0L)       // U+E000: valid, one cp
    assert(m(0xE0, 0x80, 0x80) == 1L)       // overlong 3-byte
    assert(m(0xE0, 0xA0, 0x80) == 0L)       // U+0800: valid boundary
    assert(m(0xC0, 0x80, 0xFF) == 1L)       // overlong C0 80 + bad lead
    assert(m(0xC2, 0x80, 0xFF) == 0L)       // U+0080 valid + 1 FFFD only
    assert(m(0xF4, 0x90, 0x80, 0x80) == 2L) // past U+10FFFF: 4 FFFDs
    assert(m(0xF4, 0x8F, 0xBF, 0xBF) == 0L) // U+10FFFF: valid, one cp
    assert(m(0xF0, 0x80, 0x80, 0x80) == 2L) // overlong 4-byte
    assert(m(0xF0, 0x90, 0x80, 0x80) == 0L) // U+10000: valid boundary
    assert(m(0xF5, 0x80, 0x80, 0x80) == 2L) // F5 lead: past U+10FFFF
  }

  test("hand-computed counts: multiplicity, overlap, cross-profile shares") {
    val Seq(r) = Seq("aaaa the theory und")
      .toDF("text")
      .select(TextProfileFunctions.trigramProfileScores(col("text"), profiles))
      .collect().toSeq
    val sc = r.getSeq[Long](0)
    // 'aaaa' -> positions 1,2 of 'aaa'; ' th' x2, 'the' x2, 'he ' x1 + 'heo'(no)
    assert(sc(0) == 5L, sc) // " th"x2 + "the"x2 + "he "x1
    assert(sc(1) == 1L, sc) // "und"
    assert(sc(2) == 2L, sc) // "aaa" twice (overlapping)
    assert(sc(3) == 3L, sc) // "the"x2 + "und"x1 counted again for profile 4
  }

  test("supplementary (non-BMP) code points count as single characters") {
    // U+1F600 takes two UTF-16 units but is ONE code point — gram windows
    // must advance by code point exactly like substring(t, i, 3)
    val text = "a😀b😀ab"
    val p = Seq(Seq("a😀b"))
    val got = Seq(text).toDF("text")
      .select(TextProfileFunctions.trigramProfileScores(col("text"), p))
      .head().getSeq[Long](0)
    val want = Seq(text).toDF("text").withColumn("t", col("text"))
      .select(size(filter(
        expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"),
        g => g.isInCollection(p.head))).cast("long"))
      .head().getLong(0)
    assert(got == Seq(want) && want == 1L)
  }

  test("rejects profiles with non-trigram entries") {
    intercept[IllegalArgumentException] {
      TextProfileFunctions.trigramProfileScores(col("text"), Seq(Seq("ab")))
    }
  }
}
