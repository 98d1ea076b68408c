package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the streaming
  * constructs (SURVEY.md §2.11 T3/T4) the reference never configures:
  * its job has no watermark and no event-time windows, so it can neither
  * bound state nor reason about late data.
  *
  * Shape: tumbling event-time windows per exchange over the tick stream,
  * state bounded by the watermark (late ticks beyond it are dropped
  * rather than growing state forever — the property that keeps a
  * 100 TB/day stream's state finite). Works identically on batch
  * DataFrames, where the watermark is a no-op.
  */
object WindowedStats {

  /** Streaming deduplication on the tick primary key with state bounded
    * by the watermark: re-deliveries inside the watermark horizon are
    * dropped exactly once; state for keys older than the horizon is
    * evicted. This is the in-stream half of the dedup story — the sink's
    * last-write-wins upsert (sink/Router) remains the safety net for
    * re-deliveries that outlive the horizon. */
  def dedupTicks(ticks: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("timestamp", watermarkDelay)
      .dropDuplicates("coin_id", "exchange", "timestamp")

  /** Streaming sessionization — the streaming twin of the batch
    * gaps-and-islands query (Analytics.sessionize, q_sessionize): Spark's
    * `session_window` merges events within `gap` of each other into one
    * growing window per key; a session is emitted once the watermark
    * passes gap past its last event. State per key is one open session,
    * evicted on emit — bounded regardless of stream length. Works on
    * batch frames identically (the equivalence the spec asserts). */
  def sessionStats(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Tumbling per-exchange OHLC-ish stats: count / avg / min / max price
    * per (window, exchange). In append output mode a window emits once,
    * when the watermark passes its end. */
  def tumblingTickStats(
      ticks: DataFrame,
      windowDur: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowDur), col("exchange"))
      .agg(
        count(lit(1)).as("n_ticks"),
        avg(col("price")).as("avg_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("exchange"), col("n_ticks"), col("avg_price"),
        col("min_price"), col("max_price"))
}
