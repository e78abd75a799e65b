package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

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
