package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec

/** Port of TripRowNormalizerServiceTests.cs:87-252 (SURVEY §5.1) plus the
  * DST-gap fidelity case (SURVEY §7.4 H4). */
class NormalizeSpec extends SparkSpec {

  private def normOne(row: Seq[String], convert: Boolean): Row =
    Normalize.normalize(ParseValidate.parse(rawDf(Seq(row))), convert).head()

  test("conversion off: wall clock stamped as UTC unchanged; ' y ' maps to Yes") {
    val r = normOne(validRow(Map(4 -> " y ")), convert = false)
    assert(r.getAs[String](Normalize.NormErrorCol) == null)
    assert(r.getAs[Timestamp]("pickup_utc") == Timestamp.valueOf("2020-01-01 00:28:15"))
    assert(r.getAs[String]("store_and_fwd_flag") == "Yes")
  }

  test("conversion on: January EST wall clock shifts +5h to UTC") {
    val r = normOne(validRow(), convert = true)
    assert(r.getAs[Timestamp]("pickup_utc") == Timestamp.valueOf("2020-01-01 05:28:15"))
    assert(r.getAs[Timestamp]("dropoff_utc") == Timestamp.valueOf("2020-01-01 05:33:03"))
  }

  test("conversion on: July EDT wall clock shifts +4h (DST-aware zone)") {
    val r = normOne(validRow(Map(
      0 -> "07/01/2020 10:00:00 AM", 1 -> "07/01/2020 10:30:00 AM")), convert = true)
    assert(r.getAs[Timestamp]("pickup_utc") == Timestamp.valueOf("2020-07-01 14:00:00"))
  }

  test("DST spring-forward gap local time is invalid (reference throws -> row invalid)") {
    // 2020-03-08 02:30 does not exist in America/New_York
    val r = normOne(validRow(Map(
      0 -> "03/08/2020 02:30:00 AM", 1 -> "03/08/2020 03:30:00 AM")), convert = true)
    assert(r.getAs[String](Normalize.NormErrorCol) != null)
    assert(r.getAs[String](Normalize.NormErrorCol).contains("nonexistent"))
  }

  test("DST fall-back ambiguous local time resolves to STANDARD offset, like .NET") {
    // 2020-11-01 01:30 occurs twice in America/New_York: 05:30Z (EDT, -4)
    // and 06:30Z (EST, -5). .NET TimeZoneInfo.ConvertTimeToUtc picks
    // standard time; Spark's bare to_utc_timestamp picks daylight.
    val r = normOne(validRow(Map(
      0 -> "11/01/2020 01:30:00 AM", 1 -> "11/01/2020 01:45:00 AM")), convert = true)
    assert(r.getAs[String](Normalize.NormErrorCol) == null)
    assert(r.getAs[Timestamp]("pickup_utc") == Timestamp.valueOf("2020-11-01 06:30:00"))
    assert(r.getAs[Timestamp]("dropoff_utc") == Timestamp.valueOf("2020-11-01 06:45:00"))
  }

  test("times adjacent to the fall-back hour are not shifted by ambiguity handling") {
    // 00:30 EDT (unambiguous, before the repeat) and 02:30 EST (after it)
    val r = normOne(validRow(Map(
      0 -> "11/01/2020 12:30:00 AM", 1 -> "11/01/2020 02:30:00 AM")), convert = true)
    assert(r.getAs[String](Normalize.NormErrorCol) == null)
    assert(r.getAs[Timestamp]("pickup_utc") == Timestamp.valueOf("2020-11-01 04:30:00"))
    assert(r.getAs[Timestamp]("dropoff_utc") == Timestamp.valueOf("2020-11-01 07:30:00"))
  }

  test("flag 'Z' fails normalization") {
    val r = normOne(validRow(Map(4 -> "Z")), convert = true)
    assert(r.getAs[String](Normalize.NormErrorCol)
      .contains("store_and_fwd_flag"))
  }

  test("dropoff earlier than pickup fails domain validation") {
    val r = normOne(validRow(Map(
      0 -> "01/02/2020 10:00:00 AM", 1 -> "01/02/2020 09:00:00 AM")), convert = true)
    assert(r.getAs[String](Normalize.NormErrorCol).contains("domain validation failed"))
  }

  test("dropoff equal to pickup is allowed; travel time derives in seconds") {
    val eq = normOne(validRow(Map(
      0 -> "01/02/2020 10:00:00 AM", 1 -> "01/02/2020 10:00:00 AM")), convert = true)
    assert(eq.getAs[String](Normalize.NormErrorCol) == null)
    assert(eq.getAs[Int]("travel_time_seconds") == 0)
    val r = normOne(validRow(), convert = true)
    assert(r.getAs[Int]("travel_time_seconds") == 288) // 4m48s
  }

  test("norm error is null for rows that already failed parse") {
    val df: DataFrame = Normalize.normalize(
      ParseValidate.parse(rawDf(Seq(validRow(Map(2 -> "bad")), validRow(Map(4 -> "Z"))))),
      convertToUtc = true)
    val rows = df.orderBy(CsvSource.LineNumberCol).collect()
    assert(rows(0).getAs[String](ParseValidate.ParseErrorCol) != null)
    assert(rows(0).getAs[String](Normalize.NormErrorCol) == null)
    assert(rows(1).getAs[String](Normalize.NormErrorCol) != null)
  }
}
