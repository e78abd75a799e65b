package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the pipeline's stateful operators
  * (SURVEY §2.8 — the reference is a bounded pull loop; these are the
  * unbounded versions a production deployment of the same semantics uses).
  *
  * State lives in the checkpointed state store, partitioned by key — the
  * streaming analog of the batch window-dedup's hash exchange, with the
  * same "no driver-side HashSet" scale property.
  */
object StreamingOps {

  /** First-seen-wins streaming dedup with bounded state: duplicates within
    * the watermark horizon are dropped, state older than the watermark is
    * evicted. The streaming analog of W1 (first-wins dedup). */
  def dedupWithinWatermark(
      stream: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Exact streaming dedup (unbounded state — only for keyed streams with
    * bounded key cardinality; prefer [[dedupWithinWatermark]]). */
  def dedupExact(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Event-time windowed counts with late-data handling — the streaming
    * shape of the A1 run-counter aggregation. */
  def windowedCounts(
      stream: DataFrame,
      eventTimeCol: String,
      delay: String,
      windowLength: String,
      groupCol: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLength), col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col(s"window.start").as("window_start"), col(groupCol), col("n"))

  /** The taxi ETL as an unbounded stream: the SAME ParseValidate /
    * Normalize column expressions run unchanged under Structured Streaming
    * (they are pure projections — mode-agnostic by construction). Only the
    * order-dependent pieces change shape: header resolution becomes a
    * known column layout (streams have no header row), and first-wins
    * dedup becomes first-ARRIVAL-wins keyed state (`dropDuplicates` —
    * streams have no file order; SURVEY §2.8).
    *
    * @param rawLines streaming DataFrame with a single `value` string
    *                 column (e.g. from readStream.text or a socket)
    * @param columnIndex canonical-field -> position in the delimited line
    * @return valid, deduplicated trips with the dbo.Trips-shaped columns
    */
  def taxiEtlStream(
      rawLines: DataFrame,
      config: graft.etl.EtlConfig,
      columnIndex: Map[String, Int]): DataFrame = {
    import graft.etl.{CsvSource, Dedup => _, _}
    val fields = split(col("value"),
      java.util.regex.Pattern.quote(config.delimiter), -1)
    val raw = rawLines
      .filter(trim(col("value")) =!= "") // blank lines dropped, as in batch
      .select(CsvSource.RequiredColumns.map(c =>
        fields.getItem(columnIndex(c)).as(CsvSource.rawCol(c))): _*)
    val normalized = Normalize.normalize(
      ParseValidate.parse(raw, config.inputDateTimeFormat),
      config.enableTimeZoneConversion, config.inputTimeZoneId)
    normalized
      .filter(col(ParseValidate.ParseErrorCol).isNull &&
        col(Normalize.NormErrorCol).isNull)
      .dropDuplicates("pickup_utc", "dropoff_utc", "passenger_count")
      .select(col("pickup_utc"), col("dropoff_utc"), col("passenger_count"),
        col("trip_distance"), col("store_and_fwd_flag"),
        col("pulocation_id"), col("dolocation_id"),
        col("fare_amount"), col("tip_amount"), col("travel_time_seconds"))
  }

  final case class KeyedCount(key: String, n: Long, total: Double)

  final case class SessionEvent(user: String, at: java.sql.Timestamp)
  final case class Session(user: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp, nEvents: Long)
  /** Keyed state for [[sessionizeStream]] (public: state encoders are
    * codegen'd and need a visible constructor). */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** Gap-based streaming sessionization via flatMapGroupsWithState — the
    * unbounded sibling of [[graft.ext.TemporalOps.sessionize]]. A session
    * is emitted only when it CLOSES (no event for `gap`), which is why
    * this is flatMap (0..n completed sessions per invocation) and not map
    * (exactly one output): the open session stays in keyed state, closed
    * ones flush. An EVENT-time timeout (watermark-driven, not wall-clock —
    * deterministic under replay and in tests) flushes a key's open session
    * once the watermark passes its gap deadline, so state is bounded by
    * the number of ACTIVE users, not all users ever seen — the property
    * that keeps the state store alive at production key cardinalities. */
  def sessionizeStream(stream: Dataset[SessionEvent],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import stream.sparkSession.implicits._
    stream
      .withWatermark("at", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state) =>
          if (!rows.hasNext) { // timeout fired: flush the open session
            val closed = state.getOption.map(s =>
              Session(user, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.n)).iterator
            state.remove()
            closed
          } else {
            val sorted = rows.map(_.at.getTime).toSeq.sorted
            var open = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  // late-but-admitted events (t inside the open session,
                  // possibly before its last or even its start) must
                  // WIDEN the session, never move its end backwards
                  open = Some(OpenSession(
                    math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  out += Session(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // deadline can't be set behind the current watermark (Spark
              // rejects it) — a key whose gap already elapsed flushes on
              // the next watermark tick instead
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Stream-static enrichment: an unbounded fact stream joined to a small
    * static dimension — planned as a BroadcastHashJoin per micro-batch, so
    * the stream side never shuffles (the streaming analog of j1). */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Custom keyed state via mapGroupsWithState: running (count, sum) per
    * key — the reference's run counters as continuously-updated state
    * (KeyValueGroupedDataset custom-state path, per the north star). */
  def runningStats(stream: Dataset[(String, Double)]): Dataset[KeyedCount] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(_._1)
      .mapGroupsWithState[KeyedCount, KeyedCount](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val (n0, t0) =
            if (state.exists) (state.get.n, state.get.total) else (0L, 0.0)
          var n = n0
          var t = t0
          rows.foreach { r => n += 1; t += r._2 }
          val updated = KeyedCount(key, n, t)
          state.update(updated)
          updated
      }
  }
}
