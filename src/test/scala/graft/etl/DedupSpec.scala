package graft.etl

import graft.SparkSpec

/** W1/A3 behavior: first occurrence (by line number) wins; losers carry raw
  * values; invalid rows never register a dedup key
  * (TripEtlPipelineServiceTests.cs:66-280 analog). */
class DedupSpec extends SparkSpec {

  private def annotate(rows: Seq[Seq[String]]) =
    Dedup.withFirstWins(
      Normalize.normalize(ParseValidate.parse(rawDf(rows)), convertToUtc = true))

  test("first occurrence wins, later identical keys become duplicates") {
    // rows 1 and 3 share (pickup, dropoff, passenger); row 1 must win
    val df = annotate(Seq(
      validRow(Map(7 -> "10")),
      validRow(Map(0 -> "01/05/2020 01:00:00 AM", 1 -> "01/05/2020 01:10:00 AM")),
      validRow(Map(7 -> "99"))))
    val statuses = df.orderBy(CsvSource.LineNumberCol)
      .select(Stats.statusCol.as("s")).collect().map(_.getString(0))
    assert(statuses.toSeq == Seq("inserted", "inserted", "duplicate"))
    // the loser keeps its raw fare string for the side output (H5)
    val losers = Sinks.duplicateRows(df).collect()
    assert(losers.length == 1)
    assert(losers(0).getAs[String]("fare_amount") == "99")
    assert(losers(0).getAs[Long]("LineNumber") == 3L)
  }

  test("invalid rows do not register keys and are not counted as duplicates") {
    // row 1 invalid (bad passenger) with same timestamps as row 2: row 2 inserted
    val df = annotate(Seq(validRow(Map(2 -> "bad")), validRow()))
    val statuses = df.orderBy(CsvSource.LineNumberCol)
      .select(Stats.statusCol.as("s")).collect().map(_.getString(0))
    assert(statuses.toSeq == Seq("invalid_parse", "inserted"))
  }

  test("stats: single-pass counters including the normalize-fail path (H6)") {
    val df = annotate(Seq(
      validRow(),                      // inserted
      validRow(Map(2 -> "nope")),      // invalid_parse (parsed counter NOT incremented)
      validRow(Map(4 -> "Z")),         // invalid_normalize (parsed counter incremented)
      validRow(Map(7 -> "42"))))       // duplicate of row 1 (same key)
    val s = Stats.compute(df)
    assert(s == Stats.EtlStats(total = 4, parsed = 3, invalid = 2,
      duplicates = 1, inserted = 1, duplicatesFileRows = 1))
  }
}
