package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import CsvSource.rawCol

/** P1/P2/P4/F5 — typed parse + validate with first-error-wins semantics
  * (TaxiEtl/TaxiEtl.Application/Services/TripRowParserService.cs:26-156).
  *
  * Field order (the first failing field produces the row's error, later
  * fields are not evaluated — `:34-139`): pickup → dropoff →
  * passenger_count → trip_distance → store_and_fwd_flag → PULocationID →
  * DOLocationID → fare_amount → tip_amount.
  *
  * Semantics matched:
  *  - all fields trimmed before parsing (`:174,230,268,306,342`);
  *  - timestamps: exact configured format, else lenient invariant-culture
  *    style multi-format parse (`:160-213`);
  *  - integers: strict digit strings (byte.TryParse / int.TryParse reject
  *    "1.0"), bounds 0..255 for passenger_count (TINYINT), >= 0 for
  *    location ids (`:232-246`);
  *  - decimals: NumberStyles.Float | AllowThousands — thousands separators
  *    stripped before an exact decimal cast, exponent notation accepted
  *    (`:308-312`); non-negative bounds on distance/fare/tip
  *    (`:59,71,121,133` — README.md:60-61 claims negatives pass; the code
  *    rejects them and the code wins, SURVEY §1.4).
  *
  * Everything is native Column expressions (try_to_timestamp / try_cast /
  * when) — zero UDFs, so the whole stage stays inside WholeStageCodegen
  * and Catalyst can push/prune around it.
  */
object ParseValidate {

  val ParseErrorCol = "parse_error"

  /** Lenient fallback formats approximating invariant-culture
    * DateTime.TryParse for the formats that occur in taxi-style data. The
    * golden-stats run uses no configured format (appsettings.json has no
    * InputDateTimeFormat), so this path is the one the reference exercised.
    *
    * Coverage contract: the invariant culture accepts more shapes than any
    * finite format list; this list covers US-style 12/24-hour (with and
    * without seconds / fractional seconds), ISO date and 'T' forms (again
    * ± seconds/fractions), and bare dates. Offset-suffixed ISO forms
    * (+05:00 / Z) are intentionally excluded: the reference treats inputs
    * as wall-clock EST, so an explicit offset would be silently discarded
    * — rejecting them is the safer divergence (documented here as the
    * supported subset). Order matters: earlier formats win, and the
    * fractional variants precede their whole-second prefixes so the
    * fraction is consumed, not rejected. */
  private val LenientFormats = Seq(
    "M/d/yyyy h:mm:ss.SSS a", "M/d/yyyy h:mm:ss a", "M/d/yyyy h:mm a",
    "M/d/yyyy H:mm:ss.SSS", "M/d/yyyy H:mm:ss", "M/d/yyyy H:mm",
    "yyyy-M-d H:mm:ss.SSS", "yyyy-M-d H:mm:ss", "yyyy-M-d H:mm",
    "yyyy-M-d'T'H:mm:ss.SSS", "yyyy-M-d'T'H:mm:ss", "yyyy-M-d'T'H:mm",
    "M/d/yyyy", "yyyy-M-d")

  private def parseTs(c: Column, fmt: Option[String]): Column = fmt match {
    case Some(f) => try_to_timestamp(c, lit(f))
    case None    => coalesce(LenientFormats.map(f => try_to_timestamp(c, lit(f))): _*)
  }

  /** Strict integral string (reference uses byte/int.TryParse: no decimals,
    * optional sign). */
  private def parseIntStrict(c: Column): Column =
    when(c.rlike("^[+-]?[0-9]+$"), c.try_cast("long"))

  /** Decimal with .NET NumberStyles.Float|AllowThousands: strip thousands
    * separators, accept exponent notation; exact decimal cast (overflow →
    * null → invalid). */
  private def parseDecimal(c: Column, precision: Int, scale: Int): Column =
    regexp_replace(c, ",", "").try_cast(s"decimal($precision,$scale)")

  private def empty(c: Column): Column = c.isNull || c === ""

  /** Append typed columns + `parse_error` to a CsvSource DataFrame. */
  def parse(df: DataFrame, fmt: Option[String] = None): DataFrame = {
    def t(field: String): Column = trim(col(rawCol(field)))

    val pickupT = t("tpep_pickup_datetime")
    val dropoffT = t("tpep_dropoff_datetime")
    val pcT = t("passenger_count")
    val distT = t("trip_distance")
    val flagT = t("store_and_fwd_flag")
    val puT = t("PULocationID")
    val doT = t("DOLocationID")
    val fareT = t("fare_amount")
    val tipT = t("tip_amount")

    val pickupTs = parseTs(pickupT, fmt)
    val dropoffTs = parseTs(dropoffT, fmt)
    val pc = parseIntStrict(pcT)
    val dist = parseDecimal(distT, 9, 3)
    val pu = parseIntStrict(puT)
    val dOv = parseIntStrict(doT)
    val fare = parseDecimal(fareT, 10, 2)
    val tip = parseDecimal(tipT, 10, 2)

    def fieldError(field: String, trimmed: Column, bad: Column): Column =
      when(empty(trimmed), lit(s"$field value is missing or empty"))
        .when(bad, concat(lit(s"invalid $field value: '"), trimmed, lit("'")))

    // First-error-wins: a when-chain evaluates in declaration order, so the
    // field order above is the error precedence (TripRowParserService.cs:34-139).
    val err = coalesce(
      fieldError("tpep_pickup_datetime", pickupT, pickupTs.isNull),
      fieldError("tpep_dropoff_datetime", dropoffT, dropoffTs.isNull),
      fieldError("passenger_count", pcT, pc.isNull || pc < 0 || pc > 255),
      fieldError("trip_distance", distT, dist.isNull || dist < 0),
      fieldError("store_and_fwd_flag", flagT, lit(false)),
      fieldError("PULocationID", puT, dOvBad(pu)),
      fieldError("DOLocationID", doT, dOvBad(dOv)),
      fieldError("fare_amount", fareT, fare.isNull || fare < 0),
      fieldError("tip_amount", tipT, tip.isNull || tip < 0))

    df.withColumns(Map(
      "pickup_ts" -> pickupTs,
      "dropoff_ts" -> dropoffTs,
      "passenger_count" -> pc.cast("int"),
      "trip_distance" -> dist,
      "flag_trimmed" -> flagT,
      "pulocation_id" -> dOv2Int(pu),
      "dolocation_id" -> dOv2Int(dOv),
      "fare_amount" -> fare,
      "tip_amount" -> tip,
      ParseErrorCol -> err))
  }

  /** int.TryParse bounds: outside Int32 → parse failure. */
  private def dOvBad(v: Column): Column =
    v.isNull || v < 0 || v > Int.MaxValue

  private def dOv2Int(v: Column): Column = v.cast("int")
}
