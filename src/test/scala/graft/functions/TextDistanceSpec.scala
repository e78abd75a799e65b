package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for the bounded Levenshtein expression: within the
  * bound it must equal the full-DP distance exactly (that equivalence is
  * what keeps the fuzzy_match oracle unchanged); beyond it, -1. */
class TextDistanceSpec extends SparkSpec {

  import spark.implicits._

  private def dist(pairs: Seq[(String, String, Int)]): Seq[Integer] =
    pairs.toDF("a", "b", "bnd")
      .select(TextDistanceFunctions.levenshteinWithin($"a", $"b", $"bnd"))
      .collect().map(r => if (r.isNullAt(0)) null else Integer.valueOf(r.getInt(0))).toSeq

  test("equals the full distance within the bound, -1 beyond it") {
    assert(dist(Seq(
      ("kitten", "sitting", 3),   // classic: 3, exactly at the bound
      ("kitten", "sitting", 2),   // beyond the bound
      ("abc", "abc", 0),          // identical at bound 0
      ("", "abc", 3),             // pure inserts
      ("", "abc", 2),
      ("abc", "", 5)
    )) === Seq[Integer](3, -1, 0, 3, -1, 3))
  }

  test("length-difference short-circuit agrees with the full DP") {
    // |len(a)-len(b)| > bound can never be within the bound — the kernel
    // returns -1 without touching the DP table
    assert(dist(Seq(("ab", "abcdefgh", 3))) === Seq[Integer](-1))
  }

  test("matches spark's full levenshtein on random strings (within-bound)") {
    val rnd = new Random(42)
    def s() = Seq.fill(1 + rnd.nextInt(30))(('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.fill(200)((s(), s()))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      TextDistanceFunctions.levenshteinWithin($"a", $"b", lit(100)),
      levenshtein($"a", $"b")).collect()
    // bound 100 always admits: bounded result must BE the full distance
    assert(got.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("null inputs propagate") {
    val df = Seq(("abc", "abd")).toDF("a", "b")
    val r = df.select(TextDistanceFunctions.levenshteinWithin(
      lit(null).cast("string"), $"b", lit(5))).collect()
    assert(r.head.isNullAt(0))
  }

  test("unicode: distance counts code points, not bytes") {
    // é (2 bytes) vs e — one substitution either way
    assert(dist(Seq(("café", "cafe", 2))) === Seq[Integer](1))
  }
}
