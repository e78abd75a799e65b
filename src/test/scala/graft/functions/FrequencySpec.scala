package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextOps

/** Adversarial tests for the Misra-Gries aggregate and the two-pass exact
  * heavy-hitter query built on it. The harness corpus has a tiny
  * vocabulary (< k), so the sketch's decrement/trim paths only fire here:
  * fixtures use vocabularies far above k and skewed counts, spread over
  * many partitions so partial-buffer serialize + merge is exercised. */
class FrequencySpec extends SparkSpec {

  private def sketch(toks: Seq[String], k: Int,
      partitions: Int = 8): Map[String, Long] = {
    import spark.implicits._
    toks.toDF("tok").repartition(partitions)
      .agg(FrequencyFunctions.misraGries(col("tok"), k).as("mg"))
      .collect().head.getAs[Map[String, Long]]("mg")
  }

  test("MG guarantee: every item above n/(k+1) survives a merged sketch") {
    val rnd = new Random(42)
    val k = 16
    // 3 heavy items at ~1200 occurrences each (n/(k+1) ≈ 611) + noise
    val heavy = Seq.fill(3600)(Seq("hh1", "hh2", "hh3")(rnd.nextInt(3)))
    val noise = Seq.tabulate(6800)(i => s"noise${rnd.nextInt(2000)}_$i")
    val toks = rnd.shuffle(heavy ++ noise)
    val n = toks.size
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = sketch(toks, k)

    assert(mg.size <= k, s"sketch exceeded k: ${mg.size}")
    val mustSurvive = truth.filter(_._2 > n / (k + 1)).keySet
    assert(mustSurvive.nonEmpty && mustSurvive.subsetOf(mg.keySet),
      s"lost guaranteed heavy hitters: ${mustSurvive -- mg.keySet}")
    mg.foreach { case (tok, est) =>
      val actual = truth(tok)
      assert(est <= actual, s"$tok overestimated: $est > $actual")
      assert(actual - est <= n / (k + 1),
        s"$tok undercount ${actual - est} above bound ${n / (k + 1)}")
    }
  }

  test("MG sketch is exact when distinct items fit in k") {
    val toks = Seq("a", "a", "a", "b", "b", "c")
    assert(sketch(toks, k = 8, partitions = 3) ==
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("two-pass heavy hitters equal brute-force counts on a skewed corpus") {
    import spark.implicits._
    val rnd = new Random(7)
    // 500-token vocabulary >> k=64; zipf-ish skew
    val toks = Seq.fill(20000)(s"w${(math.pow(rnd.nextDouble(), 3) * 500).toInt}")
    val docs = toks.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    val dir = tmpDir("hh") // documents-shaped fixture
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextOps.heavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    val n = toks.size
    val expected = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 10000 >= n.toLong * TextOps.HhThresholdBp }
      .toList.sortBy { case (t, c) => (-c, t) }
    assert(expected.nonEmpty && got == expected)
  }
}
