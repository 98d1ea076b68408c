package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: correlate two live event streams on key
  * within a time band, with BOTH sides watermarked so Spark can bound
  * the join state (rows older than watermark + band are evicted).
  *
  * This is the streaming twin of the batch range join
  * (Analytics.rangeJoin) and a construct the reference's 5-independent-
  * queries design could never express: its streams only ever met in
  * Cassandra, read back by the serving layer. Here clicks and purchases
  * correlate in-flight with bounded state.
  */
object StreamJoin {

  /** Join clicks to purchases of the same user within ±`bandMinutes`.
    * Both inputs need (user_id, ts, ...) shape; output one row per
    * qualifying pair, emitted once both watermarks pass. */
  def clicksWithPurchases(
      clicks: DataFrame,
      purchases: DataFrame,
      bandMinutes: Int = 5,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermarkDelay)
    c.join(p, expr(
      s"""user_id = p_user_id AND
         |purchase_ts >= click_ts - INTERVAL $bandMinutes MINUTES AND
         |purchase_ts <= click_ts + INTERVAL $bandMinutes MINUTES""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
