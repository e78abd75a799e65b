package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal operators Spark has no single built-in for — each composed
  * from existing operators per the preference order (SURVEY §7.3 / the
  * build rules: compose > custom expression > custom plan).
  *
  * Scale notes: both operators are one hash exchange on the entity key
  * plus a per-partition sort — the canonical windowed-time-series shape
  * that holds at any corpus size (state never leaves the executors).
  */
object TemporalOps {

  /** Sessionization: assign a session id per user, starting a new session
    * after a gap of more than `gapSeconds` between consecutive events.
    * lag + running sum over one user-keyed window. */
  def sessionize(spark: SparkSession, sfDir: String, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(
      prevTs.isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(prevTs)) > gapSeconds, 1L)
      .otherwise(0L)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), newSession.as("ns"))
      .withColumn("session_id",
        sum(col("ns")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("session_id"))
      .orderBy(col("event_id"))
  }

  /** As-of join: each event matched to the user's most recent order at or
    * before the event time (nulls when none). Spark lacks a native ASOF
    * join; the scalable composition is the tagged-union trick: union both
    * sides on the key/time axis, sort within key, and carry the last seen
    * order key forward with last(ignoreNulls) — one shuffle, no
    * range-join explosion. Orders are deduped to one per (custkey, date)
    * first so ties are deterministic (max orderkey wins). */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val oTagged = orders.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("is_event"), col("o_orderkey").as("ok"),
      lit(null).cast("long").as("event_id"))
    val eTagged = Tables.events(spark, sfDir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("is_event"), lit(null).cast("long").as("ok"),
      col("event_id"))
    // orders sort before events at equal time => "at or before" inclusive
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oTagged.unionByName(eTagged)
      .withColumn("last_order", last(col("ok"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        col("last_order").as("matched_orderkey"))
      .orderBy(col("event_id"))
  }

  /** Bucketized range join: count events inside each "incident window"
    * ([trigger ts, +windowMinutes) for every event with value above the
    * threshold). A naive interval join (`p.ts BETWEEN i.start AND i.end`)
    * has no equi key, so Spark plans a BroadcastNestedLoopJoin — quadratic
    * and broadcast-bound. The scalable shape bins time into
    * window-length buckets: each interval explodes to its (at most two)
    * covered bins, points carry their own bin, the join is a pure
    * EQUI-join on bin, and the exact [start, end) predicate filters the
    * small bin-local candidate set. Each (interval, point) pair meets at
    * most once (a point has exactly one bin), so no distinct is needed.
    * At 100 TB the bin key is dense and uniform — shuffle-parallel with
    * no skew, the same trick production range-join optimizers apply.
    * The trigger event lies inside its own window, so every window
    * reports >= 1. Threshold sits > 0.5 away from every data value, so
    * cross-engine float comparison cannot flip membership. */
  def rangeJoinCounts(spark: SparkSession, sfDir: String,
      threshold: Double = 300.0, windowMinutes: Int = 10): DataFrame = {
    val binSecs = windowMinutes * 60L
    val e = Tables.events(spark, sfDir)
    val points = e.select(col("event_id"), col("ts"),
      floor(unix_timestamp(col("ts")) / binSecs).as("bin"))
    val intervals = e.filter(col("value") > threshold)
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr(s"INTERVAL $windowMinutes MINUTES")).as("win_end"))
    val exploded = intervals.select(col("win_id"), col("win_start"), col("win_end"),
      explode(sequence(
        floor(unix_timestamp(col("win_start")) / binSecs),
        floor(unix_timestamp(col("win_end")) / binSecs))).as("bin"))
    exploded.join(points, usingColumn = "bin")
      .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("win_id")
  }

  /** The funnel's ordered steps, shared with the oracle. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered-funnel analysis: how many users perform each step AFTER
    * their first occurrence of the previous step (the classic strict
    * view → click → purchase funnel). Per user, step 1's time is the
    * first `view`; step i's time is the first step-i event strictly
    * after the user's step-(i-1) time. Output: one row per step with
    * the surviving user count — all exact integers.
    *
    * Scale shape: one conditional aggregation per step, each a user-
    * keyed hash aggregate joined user-to-user with the previous step's
    * times — no windows, no per-user event sorting, no state that grows
    * with events per user. At 100 TB this is #steps user-keyed
    * shuffles of (user, ts) pairs, each map-side combined by min(). */
  def funnelCounts(spark: SparkSession, sfDir: String,
      steps: Seq[String] = FunnelSteps): DataFrame =
    funnelCountsFrom(Tables.events(spark, sfDir), steps)

  /** [[funnelCounts]] over any events-shaped frame (user_id, event_type,
    * ts) — the planted-fixture entry. */
  def funnelCountsFrom(e: DataFrame,
      steps: Seq[String] = FunnelSteps): DataFrame = {
    // fold left over steps: frame of (user_id, t) = time the user
    // completed the prefix ending at this step
    val first = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("t").as("prev_t")), "user_id")
        .filter(col("ts") > col("prev_t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    val counts = reached.zip(steps.zipWithIndex).map {
      case (df, (step, i)) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("step"), lit(step).as("event_type"),
            col("n_users"))
    }
    counts.reduce(_.unionByName(_)).orderBy("step")
  }

  /** Cohort retention: users grouped by first-activity day; for each
    * (cohort day, day offset) the number of cohort users active on that
    * offset. One user-keyed aggregate for the cohort assignment, one
    * distinct (user, day) projection, one equi-join back on user, one
    * final (cohort, offset) aggregate — the canonical two-shuffle
    * retention plan; both aggregates map-side combine and no key is
    * hotter than a calendar day. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionFrom(Tables.events(spark, sfDir))

  def cohortRetentionFrom(e: DataFrame): DataFrame = {
    val days = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** MAD multiplier for [[anomalyDays]], shared with the oracle. */
  val AnomalyK = 3

  /** Robust per-series outlier detection: for each event_type's daily
    * count series, flag days where |n − median| > K · MAD (median
    * absolute deviation). Median and MAD are the DISCRETE lower medians
    * selected by rank arithmetic — exact integers, so the flag
    * comparison is integer-exact cross-engine (the
    * [[TextOps.sourceLenPercentiles]] trick applied twice).
    *
    * Scale note: the windows partition by event_type over the DAILY
    * AGGREGATE — one row per (type, day), bounded by calendar ×
    * #types, metadata-scale forever. The only data-scale operation is
    * the first map-side-combined count. */
  def anomalyDays(spark: SparkSession, sfDir: String,
      k: Int = AnomalyK): DataFrame =
    anomalyDaysFrom(Tables.events(spark, sfDir), k)

  def anomalyDaysFrom(e: DataFrame, k: Int = AnomalyK): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val d = dailyCounts(e)
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val w = W.partitionBy(col("event_type")).orderBy(col(value), col("day"))
      df.withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(W.partitionBy(col("event_type"))))
        .filter(col("rk") === expr("(cnt + 1) div 2"))
        .select(col("event_type"), col(value).as(out))
    }
    val med = lowerMedian(d, "n", "med")
    val dev = d.join(med, "event_type")
      .withColumn("ad", abs(col("n") - col("med")))
    val mad = lowerMedian(dev, "ad", "mad")
    dev.join(mad, "event_type")
      .filter(col("ad") > lit(k.toLong) * col("mad"))
      .select(col("event_type"), col("day"), col("n"), col("med"), col("mad"))
      .orderBy(col("event_type"), col("day"))
  }

  /** The per-(event_type, day) count series — the ONE definition of
    * "daily counts" shared by [[anomalyDaysFrom]] and [[dodChange]]
    * (and, via [[DailyCountsCte]], by their oracles). */
  private def dailyCounts(e: DataFrame): DataFrame =
    e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  /** DuckDB twin of [[dailyCounts]] (CTE body). */
  private val DailyCountsCte: String =
    """d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  /** Day-over-day deltas per event_type: daily counts with the previous
    * day's count and the signed change (lag over the metadata-scale
    * daily aggregate — same bounded-window argument as
    * [[anomalyDays]]). First day per series has no prior: delta null. */
  def dodChange(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("event_type")).orderBy(col("day"))
    dailyCounts(Tables.events(spark, sfDir))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - col("prev_n"))
      .orderBy(col("event_type"), col("day"))
  }

  val oracles: Map[String, String] = Map(
    "dod_change" ->
      s"""WITH $DailyCountsCte
         |SELECT event_type, day, n,
         |  lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
         |  n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
         |FROM d
         |ORDER BY event_type, day""".stripMargin,
    "anomaly_days" ->
      s"""WITH $DailyCountsCte, med AS (
         |  SELECT event_type, n AS med FROM (
         |    SELECT event_type, day, n,
         |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day) AS rk,
         |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
         |    FROM d) t
         |  WHERE rk = (cnt + 1) // 2
         |), dev AS (
         |  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS ad
         |  FROM d JOIN med m USING (event_type)
         |), mad AS (
         |  SELECT event_type, ad AS mad FROM (
         |    SELECT event_type, day, ad,
         |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad, day) AS rk,
         |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
         |    FROM dev) t
         |  WHERE rk = (cnt + 1) // 2
         |)
         |SELECT dev.event_type, dev.day, dev.n, dev.med, mad.mad
         |FROM dev JOIN mad USING (event_type)
         |WHERE dev.ad > $AnomalyK * mad.mad
         |ORDER BY dev.event_type, dev.day""".stripMargin,
    "funnel_counts" -> {
      val Seq(s1, s2, s3) = FunnelSteps
      s"""WITH r1 AS (
         |  SELECT user_id, MIN(ts) AS t FROM events
         |  WHERE event_type = '$s1' GROUP BY user_id
         |), r2 AS (
         |  SELECT e.user_id, MIN(e.ts) AS t
         |  FROM events e JOIN r1 ON e.user_id = r1.user_id
         |  WHERE e.event_type = '$s2' AND e.ts > r1.t
         |  GROUP BY e.user_id
         |), r3 AS (
         |  SELECT e.user_id, MIN(e.ts) AS t
         |  FROM events e JOIN r2 ON e.user_id = r2.user_id
         |  WHERE e.event_type = '$s3' AND e.ts > r2.t
         |  GROUP BY e.user_id
         |)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS step, '$s1' AS event_type,
         |    (SELECT COUNT(*) FROM r1) AS n_users
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), '$s2', (SELECT COUNT(*) FROM r2)
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), '$s3', (SELECT COUNT(*) FROM r3)) t
         |ORDER BY step""".stripMargin
    },
    "cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), cohorts AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
        |)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM days d JOIN cohorts c ON d.user_id = c.user_id
        |GROUP BY c.cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "range_join_counts" ->
      """SELECT i.win_id, COUNT(*) AS n_events
        |FROM (SELECT event_id AS win_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
        |      FROM events WHERE value > 300.0) i
        |JOIN events ev ON ev.ts >= i.s AND ev.ts < i.e
        |GROUP BY i.win_id ORDER BY win_id""".stripMargin,
    "sessionize" ->
      """SELECT event_id, user_id, session_id FROM (
        |  SELECT event_id, user_id,
        |    CAST(SUM(CASE WHEN prev_ts IS NULL
        |          OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT event_id, user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events) t1) t2
        |ORDER BY event_id""".stripMargin,
    "asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, o.o_orderkey AS matched_orderkey
        |FROM events e
        |ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
  )
}
