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

  val oracles: Map[String, String] = Map(
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
