package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the log-bucket quantile sketch
  * ([[graft.queries.Analytics.quantileSketch]], gated as
  * q_quantile_sketch): the bounded bucket histogram maintained
  * CONTINUOUSLY over an event stream.
  *
  * The cells are additive counts over a FIXED integer key space — octave
  * and sub-bucket come from exact integer arithmetic on the cent value,
  * ≤ 64·sub cells per event_type at ANY stream length — so incremental
  * maintenance is exactly a stateful streaming aggregation: each
  * micro-batch's partial counts merge into the running cells by
  * addition, and the result after any batch split equals the batch
  * sketch over the union (StreamQuantileSpec asserts both, the
  * StreamSketch count-min convention). Quantile extraction stays an
  * on-demand read over the bounded cells (each bucket carries its exact
  * [lo, hi] cent bounds), never a rescan of the stream — the property
  * that makes this the latency sketch you keep per ingest shard at
  * 100 TB and merge downstream cell-wise.
  */
object StreamQuantile {

  /** Attach to a streaming (or batch) frame with `event_type` and
    * `value` columns. Run with output mode `complete` (the aggregate is
    * ≤ 64·sub rows per event_type) or `update` for a changelog of
    * touched cells. */
  def cells(events: DataFrame, sub: Int = 8): DataFrame =
    graft.queries.Analytics.sketchCells(
      events.select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .filter(col("c") >= 1),
      sub)
}
