package graft.etl

import graft.SparkSpec

/** The end-to-end oracle: the full pipeline over the reference's bundled
  * 30,000-row CSV must reproduce the published run statistics EXACTLY
  * (/root/reference/README.md:44; re-derived independently in SURVEY §0). */
class GoldenStatsSpec extends SparkSpec {

  private val referenceCsv = "/root/reference/TaxiEtl/data/sample-cab-data.csv"

  test("golden stats: Total=30000 Parsed=29855 Invalid=145 Duplicates=15 Inserted=29840") {
    assume(new java.io.File(referenceCsv).exists())
    val out = tmpDir("golden")
    val config = EtlConfig(
      inputCsvPath = referenceCsv,
      duplicatesCsvPath = s"$out/duplicates",
      insertedPath = s"$out/trips")
    val stats = Pipeline.run(spark, config)
    assert(stats == Stats.EtlStats(
      total = 30000, parsed = 29855, invalid = 145,
      duplicates = 15, inserted = 29840, duplicatesFileRows = 15))

    // the duplicates side file: header + 15 raw rows
    val dupCsv = spark.read.option("header", "true").csv(s"$out/duplicates")
    assert(dupCsv.count() == 15)
    assert(dupCsv.columns.head == "LineNumber")
    assert(dupCsv.columns.contains("tpep_pickup_datetime"))

    // the inserted "table" with the dbo.Trips schema incl. computed column
    val trips = spark.read.parquet(s"$out/trips")
    assert(trips.count() == 29840)
    assert(trips.columns.contains("TravelTimeSeconds"))
  }

  test("scaled taxi surface reproduces its planted counts at sf0.001") {
    // 5 lines per event over 1000 events: planted parse-invalid (E%97,
    // E%89), normalize-invalid (E%83, E%79) and E%101 duplicate groups.
    // Golden values derived ANALYTICALLY from the planting rules in an
    // independent DuckDB replay (TaxiScaled.oracles) — this pins the whole
    // sharded string round-trip: format → 8-shard write → readSharded →
    // parse → EST→UTC → (src_file, byte_offset) first-wins dedup.
    val r = graft.queries.TaxiScaled.stats(spark, "/root/testdata/sf0.001").head()
    assert((0 to 5).map(r.getLong) == Seq(5000L, 4892L, 231L, 49L, 4720L, 49L),
      s"scaled golden counters drifted: $r")
  }
}
