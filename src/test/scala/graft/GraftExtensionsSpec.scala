package graft

import org.apache.spark.sql.SparkSession

/** The SQL-function surface: custom expressions must be callable from
  * plain spark.sql once GraftExtensions is installed. */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot / minhash_signature / simhash64 are callable from SQL") {
    val base = spark // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = s2.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
      assert(dot == 11.0)
      // decimal literals (what plain SQL array(1.0, 2.0) infers) must coerce
      val dotDec = s2.sql(
        "SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d").head().getDouble(0)
      assert(dotDec == 11.0)
      val sig = s2.sql(
        "SELECT minhash_signature(array(42L, 7L)) AS s").head()
        .getSeq[Long](0)
      assert(sig.length == 128)
      val sh = s2.sql("SELECT simhash64(array(0L)) AS h").head().getLong(0)
      assert(sh == 0L) // all bits vote -1 except none set -> ties -> ...
      // winnow_fingerprint(text, k, w): int literals drive the constants
      val nf = s2.sql(
        "SELECT size(winnow_fingerprint('the quick brown fox jumps', 8, 4)) AS n")
        .head().getInt(0)
      assert(nf > 0 && nf <= 25 - 8 + 1)
      // media round-trip through pure SQL: synthesize then header-decode
      val m = s2.sql(
        """SELECT m.* FROM (
          |  SELECT media_header_decode(synth_media(1, 'hello world')) AS m) t""".stripMargin)
        .head()
      assert(m.getAs[String]("format") == "bmp") // doc_id 1 -> bmp
      assert(m.getAs[Int]("width") == 11 % 640 + 16)
      assert(m.getAs[Long]("n_frames") == 1L)
      // misra_gries is an AGGREGATE from SQL (analyzer wraps the bare
      // AggregateFunction); exact counts when distinct items fit in k
      val mg = s2.sql(
        """SELECT misra_gries(t, 8) AS m
          |FROM (SELECT explode(array('a','a','b')) AS t)""".stripMargin)
        .head().getAs[Map[String, Long]](0)
      assert(mg == Map("a" -> 2L, "b" -> 1L))
      // zorder_value: interleave of x=3 (bits 0,1), y=1 (bit 0) ->
      // x bits at even positions, y at odd: 1|2|8 = 0b1011 = 11... y bit0
      // lands at position 1: 3 -> 0b101, +2 -> 0b111? compute: x=3,y=1:
      // (x bit0)<<0 + (y bit0)<<1 + (x bit1)<<2 = 1 + 2 + 4 = 7
      val z = s2.sql("SELECT zorder_value(3, 1) AS z").head().getLong(0)
      assert(z == 7L)
      // topk_by_score is an aggregate too: (score desc, id asc) order
      val tk = s2.sql(
        """SELECT topk_by_score(s, i, 2) AS t FROM (
          |  SELECT * FROM VALUES (1.0, 10), (3.0, 20), (3.0, 5), (2.0, 1) v(s, i))""".stripMargin)
        .head().getSeq[Long](0)
      assert(tk == Seq(5L, 20L))
      // levenshtein_within: per-row bound column, -1 sentinel beyond it
      val lv = s2.sql(
        """SELECT levenshtein_within(a, b, bnd) AS d FROM VALUES
          |  ('kitten', 'sitting', 3), ('kitten', 'sitting', 2) v(a, b, bnd)""".stripMargin)
        .collect().map(_.getInt(0)).toSeq
      assert(lv == Seq(3, -1))
      // trigram_profile_scores: the lang-ID scorer with literal profiles.
      // "the theme" grams: the, "he ", "e t", " th", the, hem, eme ->
      // profile 0 ('the') counts 2; profile 1 ('eme','he ') counts 1+1
      val tps = s2.sql(
        "SELECT trigram_profile_scores('the theme', array(array('the'), array('eme', 'he '))) AS s")
        .head().getSeq[Long](0)
      assert(tps == Seq(2L, 2L))
      // non-literal profiles must be rejected loudly, not miscompiled
      val err = intercept[Exception] {
        s2.sql("SELECT trigram_profile_scores(t, array(array(t))) FROM (SELECT 'the' AS t)").collect()
      }
      assert(err.getMessage.contains("literal"), err.getMessage)
      // null elements inside the literal get the clean validation error,
      // not an analyzer NPE
      val errNullGram = intercept[Exception] {
        s2.sql("SELECT trigram_profile_scores('the', array(array('the', NULL)))").collect()
      }
      assert(errNullGram.getMessage.contains("null"), errNullGram.getMessage)
      val errNullProfile = intercept[Exception] {
        s2.sql("SELECT trigram_profile_scores('the', array(array('the'), NULL))").collect()
      }
      assert(errNullProfile.getMessage.contains("null"), errNullProfile.getMessage)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
