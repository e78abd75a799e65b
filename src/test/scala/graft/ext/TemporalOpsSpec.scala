package graft.ext

import java.sql.Timestamp

import graft.SparkSpec

/** Planted-fixture tests for the behavioral-analytics operators: the
  * strict-ordering funnel semantics and cohort/offset arithmetic are
  * pinned here; the harness-data results are oracle-checked. */
class TemporalOpsSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, et, ts), i) =>
      (i.toLong, u, et, Timestamp.valueOf(ts))
    }.toDF("event_id", "user_id", "event_type", "ts")
  }

  private def funnel(rows: Seq[(Long, String, String)]) =
    TemporalOps.funnelCountsFrom(ev(rows)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("funnel: steps count only strictly-ordered completions") {
    val rows = Seq(
      // user 1 completes the whole funnel in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2 clicks BEFORE viewing — click must not count
      (2L, "click", "2024-01-02 09:00:00"),
      (2L, "view", "2024-01-02 10:00:00"),
      (2L, "purchase", "2024-01-02 11:00:00"),
      // user 3 views only
      (3L, "view", "2024-01-03 08:00:00"))
    assert(funnel(rows) === Seq(
      (1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel: equal timestamps do not advance (strictly after)") {
    val rows = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    assert(funnel(rows) === Seq(
      (1L, "view", 1L), (2L, "click", 0L), (3L, "purchase", 0L)))
  }

  test("funnel: later duplicate of an earlier step can still advance the next") {
    // the user's FIRST view is t0; a click before t0 is dead, a click
    // after any view counts against the first view's time
    val rows = Seq(
      (1L, "click", "2024-01-01 09:00:00"),
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"))
    assert(funnel(rows) === Seq(
      (1L, "view", 1L), (2L, "click", 1L), (3L, "purchase", 0L)))
  }

  test("anomaly days: spike beyond 3x MAD flagged, normal variation not") {
    // series for one event_type: counts 2,2,2,3,2,2,2 over 7 days plus a
    // 30-count spike day -> lower median 2, deviations 0,0,0,1,0,0,0,28,
    // MAD 0 ... use a series with nonzero MAD instead: counts
    // 10,11,12,13,14 (med 12, MAD 1) and a 20-count day (dev 8 > 3)
    val base = Seq(10, 11, 12, 13, 14).zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (i.toLong, "view", f"2024-01-${d + 1}%02d 0${i % 9}:00:0${i % 9}"))
    }
    val spike = (1 to 20).map(i => (i.toLong, "view", f"2024-01-20 0${i % 9}:01:0${i % 9}"))
    val got = TemporalOps.anomalyDaysFrom(ev(base ++ spike)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 6 days of counts 10,11,12,13,14,20: lower median (rank 3) = 12,
    // deviations 2,1,0,1,2,8 -> lower MAD (rank 3) = 1; only the spike
    // day's deviation 8 exceeds 3*1
    assert(got === Seq(("view", "2024-01-20", 20L, 12L, 1L)))
  }

  test("cohort retention: offsets measured from each user's first day") {
    val rows = Seq(
      (1L, "view", "2024-01-01 10:00:00"), // cohort Jan 1
      (1L, "view", "2024-01-01 22:00:00"), // same day, one activity row
      (1L, "click", "2024-01-03 10:00:00"), // offset 2
      (2L, "view", "2024-01-01 11:00:00"), // cohort Jan 1
      (3L, "view", "2024-01-02 09:00:00"), // cohort Jan 2
      (3L, "view", "2024-01-03 09:00:00")) // offset 1
    val got = TemporalOps.cohortRetentionFrom(ev(rows)).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }
}
