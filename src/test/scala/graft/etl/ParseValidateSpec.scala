package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Port of TripRowParserServiceTests.cs:39-303 (SURVEY §5.1). */
class ParseValidateSpec extends SparkSpec {

  private def parseOne(row: Seq[String], fmt: Option[String] = None): Row =
    ParseValidate.parse(rawDf(Seq(row)), fmt).head()

  private def errorOf(row: Seq[String], fmt: Option[String] = None): String =
    parseOne(row, fmt).getAs[String](ParseValidate.ParseErrorCol)

  test("valid row parses all fields with types") {
    val r = parseOne(validRow())
    assert(r.getAs[String](ParseValidate.ParseErrorCol) == null)
    assert(r.getAs[Timestamp]("pickup_ts") == Timestamp.valueOf("2020-01-01 00:28:15"))
    assert(r.getAs[Timestamp]("dropoff_ts") == Timestamp.valueOf("2020-01-01 00:33:03"))
    assert(r.getAs[Int]("passenger_count") == 1)
    assert(r.getAs[java.math.BigDecimal]("trip_distance")
      .compareTo(new java.math.BigDecimal("1.2")) == 0)
    assert(r.getAs[Int]("pulocation_id") == 238)
    assert(r.getAs[java.math.BigDecimal]("fare_amount")
      .compareTo(new java.math.BigDecimal("6")) == 0)
  }

  test("exact configured format: matching value parses, other format fails") {
    val fmt = Some("yyyy-MM-dd HH:mm:ss")
    assert(errorOf(validRow(Map(0 -> "2020-01-01 00:28:15",
      1 -> "2020-01-01 00:33:03")), fmt) == null)
    assert(errorOf(validRow(), fmt) != null) // M/d/yyyy form rejected
  }

  test("lenient fallback accepts the common invariant-culture shapes") {
    val accepted = Seq(
      "1/2/2020 3:04 PM",              // 12-hour, no seconds
      "1/2/2020 03:04:05.120 PM",      // 12-hour with fractional seconds
      "2020-1-2 3:04",                 // ISO-ish, no seconds
      "2020-01-02T03:04:05",           // ISO 'T'
      "2020-01-02T03:04:05.250",       // ISO 'T' with fraction
      "1/2/2020")                      // bare date
    for (v <- accepted)
      assert(errorOf(validRow(Map(0 -> v))) == null, s"rejected: $v")
    // offset-suffixed forms are deliberately NOT accepted: inputs are
    // wall-clock EST and an explicit offset would be silently discarded
    assert(errorOf(validRow(Map(0 -> "2020-01-02T03:04:05+05:00"))) != null)
  }

  test("fields are trimmed before parsing") {
    val r = parseOne(validRow(Map(2 -> "  1  ", 4 -> "  N ")))
    assert(r.getAs[String](ParseValidate.ParseErrorCol) == null)
    assert(r.getAs[Int]("passenger_count") == 1)
    assert(r.getAs[String]("flag_trimmed") == "N")
  }

  test("invalid pickup date reported first (first-error-wins)") {
    val err = errorOf(validRow(Map(0 -> "not-a-date", 2 -> "bad-too")))
    assert(err.contains("tpep_pickup_datetime"))
  }

  test("empty dropoff is invalid") {
    assert(errorOf(validRow(Map(1 -> ""))).contains("tpep_dropoff_datetime"))
  }

  test("passenger_count: non-integer, negative, >255 and decimal forms are invalid") {
    for (bad <- Seq("abc", "-1", "300", "1.0"))
      assert(errorOf(validRow(Map(2 -> bad))).contains("passenger_count"), bad)
    assert(errorOf(validRow(Map(2 -> "255"))) == null)
  }

  test("negative trip_distance rejected (code wins over README claim)") {
    assert(errorOf(validRow(Map(3 -> "-0.5"))).contains("trip_distance"))
  }

  test("decimals accept thousands separators and exponent notation") {
    val r = parseOne(validRow(Map(3 -> "1,234.56", 7 -> "1e2")))
    assert(r.getAs[String](ParseValidate.ParseErrorCol) == null)
    assert(r.getAs[java.math.BigDecimal]("trip_distance")
      .compareTo(new java.math.BigDecimal("1234.560")) == 0)
    assert(r.getAs[java.math.BigDecimal]("fare_amount")
      .compareTo(new java.math.BigDecimal("100.00")) == 0)
  }

  test("invalid and negative fare_amount rejected") {
    assert(errorOf(validRow(Map(7 -> "abc"))).contains("fare_amount"))
    assert(errorOf(validRow(Map(7 -> "-4.5"))).contains("fare_amount"))
  }

  test("invalid tip_amount rejected") {
    assert(errorOf(validRow(Map(8 -> "x"))).contains("tip_amount"))
  }

  test("empty flag rejected at parse stage") {
    assert(errorOf(validRow(Map(4 -> "  "))).contains("store_and_fwd_flag"))
  }

  test("error precedence follows field order") {
    // passenger bad AND fare bad -> passenger reported
    val err = errorOf(validRow(Map(2 -> "x", 7 -> "-1")))
    assert(err.contains("passenger_count"))
  }
}
