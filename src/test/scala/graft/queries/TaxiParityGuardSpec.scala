package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Reference-parity REGRESSION GUARD (r12 verdict ask #7): the ETL core
  * has been stable for several rounds, and the ext/ surface keeps
  * growing around it — this spec freezes the reference-visible outputs
  * against COMMITTED constants so any future refactor that silently
  * disturbs parity (a parse rule, the EST→UTC conversion, dedup
  * ordering, a cast) fails the build loudly, without waiting for the
  * driver's oracle pass.
  *
  * Two layers:
  *  - the six golden counters (/root/reference/README.md:44), asserted
  *    as literal values (GoldenStatsSpec already pins these through
  *    Pipeline.run; here they guard the QUERY-surface path through
  *    TaxiQueries.stats, which shares the annotated frame with Q1–Q4);
  *  - an MD5 over the canonical row rendering of each of the four
  *    analytic queries (README.md:21-25) — full result-set parity
  *    including order, formatting, and float representation, the same
  *    properties the driver's hash compare checks.
  *
  * If a change legitimately alters these outputs (it shouldn't — the
  * reference is frozen), the constants must be re-derived and the
  * change explained in the commit, never silently re-pinned. */
class TaxiParityGuardSpec extends SparkSpec {

  /** Canonical result hash: rows in query order, fields joined by '|'
    * via String.valueOf (stable for the BIGINT/DOUBLE/STRING columns
    * these queries emit), MD5 over the UTF-8 body. */
  private def canonicalHash(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val body = df.collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).mkString("\n")
    md.digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("parity guard: golden counters + four taxi query hashes match " +
      "committed constants") {
    assume(new java.io.File(TaxiQueries.ReferenceCsv).exists())
    // golden six counters through the query surface
    val s = TaxiQueries.stats(spark, "").head()
    assert((0 until 6).map(s.getLong) ==
      Seq(30000L, 29855L, 145L, 15L, 29840L, 15L),
      s"golden counters drifted: $s")
    // committed result-set hashes (derivation: canonicalHash over each
    // query at UTC session timezone — re-derive ONLY for an explained,
    // deliberate change; the reference data is frozen)
    val expected = Seq[(String, DataFrame, String)](
      ("taxi_q1_avg_tip_by_pu", TaxiQueries.q1AvgTipByPu(spark, ""),
        "626b653121a5d163c7263ffd9173bb59"),
      ("taxi_q2_top100_distance", TaxiQueries.q2Top100Distance(spark, ""),
        "7c053bc30c7b8a39db540cf62eacbb53"),
      ("taxi_q3_top100_travel_time", TaxiQueries.q3Top100TravelTime(spark, ""),
        "6609e3c85aeae4ce8e2439aff04a5f14"),
      ("taxi_q4_filter_by_pu", TaxiQueries.q4FilterByPu(spark, ""),
        "9ec5f9618f3eb4855570731f37d927ad"))
    expected.foreach { case (name, df, want) =>
      val got = canonicalHash(df)
      assert(got == want, s"$name parity hash drifted: got $got want $want")
    }
  }
}
