package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

import graft.functions.{MediaHeaderDecode, MinHashSignature, SimHash64, SynthMedia, VecDot, WinnowFingerprint}

/** SparkSessionExtensions entry point: registers the custom codegen'd
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * works anywhere in the session (including thrift/connect clients).
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic, or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // implementing class is per-function — DESCRIBE FUNCTION reports it
  private def info(cls: Class[_], name: String, usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  // SQL callers pass whatever numeric array the literal syntax infers
  // (array(1.0, 2.0) is array<decimal>): coerce explicitly, as the Scala
  // wrappers in SketchFunctions/VectorFunctions do.
  private def asDoubles(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def asLongs(e: Expression): Expression = Cast(e, ArrayType(LongType))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info(classOf[VecDot],
        "vec_dot", "vec_dot(a, b) - dot product of two numeric-array vectors"),
      (args: Seq[Expression]) => VecDot(asDoubles(args(0)), asDoubles(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info(classOf[MinHashSignature], "minhash_signature",
        "minhash_signature(hashes) - 128-perm MinHash signature over array<long>"),
      (args: Seq[Expression]) => MinHashSignature(asLongs(args(0)))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info(classOf[SimHash64],
        "simhash64", "simhash64(hashes) - 64-bit SimHash over array<long>"),
      (args: Seq[Expression]) => SimHash64(asLongs(args(0)))))
    // constructor constants (they size per-row state), so the SQL
    // arguments must be foldable; validate and coerce explicitly — a raw
    // eval().asInstanceOf would throw ClassCastException on a decimal
    // literal and UnsupportedOperationException on a column ref
    def foldableInt(fn: String)(e: Expression, name: String): Int = {
      if (!e.foldable)
        throw new IllegalArgumentException(
          s"$fn: $name must be a literal integer, got ${e.sql}")
      Option(Cast(e, org.apache.spark.sql.types.IntegerType).eval())
        .map(_.asInstanceOf[Int])
        .getOrElse(throw new IllegalArgumentException(
          s"$fn: $name must not be null"))
    }
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprint"),
      info(classOf[WinnowFingerprint], "winnow_fingerprint",
        "winnow_fingerprint(text, k, w) - winnowed Rabin-Karp fingerprints (k-char grams, w-gram windows)"),
      (args: Seq[Expression]) => {
        if (args.length != 3)
          throw new IllegalArgumentException(
            s"winnow_fingerprint(text, k, w) takes 3 arguments, got ${args.length}")
        WinnowFingerprint(Cast(args(0), StringType),
          k = foldableInt("winnow_fingerprint")(args(1), "k"),
          w = foldableInt("winnow_fingerprint")(args(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("synth_media"),
      info(classOf[SynthMedia], "synth_media",
        "synth_media(doc_id, text) - byte-correct PNG/BMP/WAV container carrying text"),
      (args: Seq[Expression]) =>
        SynthMedia(Cast(args(0), LongType), Cast(args(1), StringType))))
    ext.injectFunction((
      FunctionIdentifier("media_header_decode"),
      info(classOf[MediaHeaderDecode], "media_header_decode",
        "media_header_decode(blob) - parse format/width/height/n_frames from container headers"),
      (args: Seq[Expression]) => MediaHeaderDecode(args(0))))
    // aggregate functions: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression, so the builder returns it unwrapped
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info(classOf[graft.functions.MisraGriesAgg], "misra_gries",
        "misra_gries(item, k) - bounded k-counter frequent-items summary (map<string,long>)"),
      (args: Seq[Expression]) => graft.functions.MisraGriesAgg(
        Cast(args(0), StringType), k = foldableInt("misra_gries")(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      info(classOf[graft.functions.TopKByScoreAgg], "topk_by_score",
        "topk_by_score(score, id, k) - ids of the k highest (score, lowest id) rows, rank-ordered (array<long>)"),
      (args: Seq[Expression]) => graft.functions.TopKByScoreAgg(
        Cast(args(0), DoubleType), Cast(args(1), LongType),
        k = foldableInt("topk_by_score")(args(2), "k"))))
    ext.injectFunction((
      FunctionIdentifier("levenshtein_within"),
      info(classOf[graft.functions.LevenshteinWithin], "levenshtein_within",
        "levenshtein_within(a, b, bound) - edit distance if <= bound (per-row), else -1; banded DP"),
      (args: Seq[Expression]) => graft.functions.LevenshteinWithin(
        Cast(args(0), StringType), Cast(args(1), StringType),
        Cast(args(2), org.apache.spark.sql.types.IntegerType))))
    ext.injectFunction((
      FunctionIdentifier("trigram_profile_scores"),
      info(classOf[graft.functions.TrigramProfileScores], "trigram_profile_scores",
        "trigram_profile_scores(text, profiles) - per-profile trigram occurrence counts " +
          "(array<long>, one element per profile); profiles is a literal " +
          "array<array<string>> of 3-codepoint grams"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"trigram_profile_scores(text, profiles) takes 2 arguments, got ${args.length}")
        val p = args(1)
        if (!p.foldable)
          throw new IllegalArgumentException(
            s"trigram_profile_scores: profiles must be a literal array of string arrays, got ${p.sql}")
        // profiles size the per-key tables at construction — evaluate the
        // foldable literal here, the same constant-argument contract as
        // winnow_fingerprint's k/w
        val data = Option(Cast(p, ArrayType(ArrayType(StringType))).eval())
          .getOrElse(throw new IllegalArgumentException(
            "trigram_profile_scores: profiles must not be null"))
        val profiles = data.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(ArrayType(StringType)).toSeq.map { inner =>
            if (inner == null) throw new IllegalArgumentException(
              "trigram_profile_scores: profiles must not contain a null profile")
            inner.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toObjectArray(StringType).toSeq.map { g =>
                if (g == null) throw new IllegalArgumentException(
                  "trigram_profile_scores: profile grams must not be null")
                g.toString
              }
          }
        graft.functions.TrigramProfileScores(Cast(args(0), StringType), profiles)
      }))
    ext.injectFunction((
      FunctionIdentifier("zorder_value"),
      info(graft.plans.Layouts.getClass, "zorder_value",
        "zorder_value(x, y) - 32-bit Morton interleave of two dimensions (16 bits each)"),
      (args: Seq[Expression]) => graft.plans.Layouts.zorderExpr(args(0), args(1))))
  }
}
