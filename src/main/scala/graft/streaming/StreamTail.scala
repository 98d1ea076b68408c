package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Continuous tail-risk monitoring: per event-time window, the exact
  * P95 and upper-tail mean of the value distribution — the streaming
  * face of `queries/Temporal.varEs`'s histogram order-statistic
  * machinery (a latency/exposure SLO monitor watches exactly this).
  *
  * Scale shape: the stream aggregates to (window, type, cents)
  * histogram counts under a watermark — state is bounded by
  * #open-windows · #types · |distinct cents| (value-domain-sized, not
  * event-count-sized) — and the quantile assembly runs per EMITTED
  * window over those bounded rows, downstream of the append sink. A
  * window's streaming tail stats equal the batch stats of the same
  * rows (StreamTailSpec asserts bit-equality, plus crash-replay and
  * late-data cases like StreamDriftSpec).
  */
object StreamTail {

  /** Streaming side: watermarked per-window value histogram in append
    * mode — one row per closed (window, type, cents). */
  def windowedCents(events: DataFrame, windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cents"), col("cnt"))

  /** Exact P95 + upper-tail mean per (window, type) from the emitted
    * histogram: k = ⌈0.95n⌉-th smallest via the running count (frame
    * bounded by distinct cents per window), tail = the n−k values
    * strictly above that order statistic, as integer algebra on the
    * pick row. Null tail mean when the window has no strict tail. */
  def tailPerWindow(hist: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("win_start"), col("event_type"))
    val cum = byKey.orderBy(col("cents"))
    hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("cumv", sum(col("cnt") * col("cents")).over(cum))
      .withColumn("n", sum(col("cnt")).over(byKey))
      .withColumn("tv", sum(col("cnt") * col("cents")).over(byKey))
      .withColumn("k", expr("(19 * n + 19) div 20")) // ceil(.95 n)
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("win_start"), col("event_type"), col("n"),
        (col("cents").cast("double") / 100.0).as("p95"),
        when(col("n") === col("k"), lit(null).cast("double"))
          .otherwise(round((col("tv") - col("cumv")
              + (col("cum") - col("k")) * col("cents")).cast("double")
              / (col("n") - col("k")).cast("double") / 100.0 * 1e6)
            .cast("long").cast("double") / 1e6).as("tail_mean"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Batch face, oracle-gated as q_window_p95: the post-split slice
    * through the SAME windowed-histogram plan (withWatermark is a no-op
    * on a batch Dataset) and the same tail assembly. */
  def windowTail(spark: SparkSession, dir: String,
      split: String = "2024-01-15 00:00:00"): DataFrame =
    tailPerWindow(windowedCents(
      Tables.events(spark, dir)
        .filter(col("ts") >= lit(split).cast("timestamp"))
        .select(col("ts"), col("event_type"), col("value"))))

  /** DuckDB oracle for [[windowTail]] — epoch-aligned 6h window starts
    * (CAST to plain TIMESTAMP: DuckDB's to_timestamp is TIMESTAMPTZ,
    * Spark's window().start is TIMESTAMP — the q_window_psi lesson). */
  val windowTailSql: String =
    """WITH cur AS (
      |  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT)
      |              * 21600) AS TIMESTAMP) AS win_start,
      |    event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
      |h AS (
      |  SELECT win_start, event_type, cents, count(*) AS cnt
      |  FROM cur GROUP BY 1, 2, 3),
      |t AS (
      |  SELECT win_start, event_type, cents, cnt,
      |    CAST(sum(cnt) OVER w AS BIGINT) AS cum,
      |    CAST(sum(cnt * cents) OVER w AS BIGINT) AS cumv,
      |    CAST(sum(cnt) OVER p AS BIGINT) AS n,
      |    CAST(sum(cnt * cents) OVER p AS BIGINT) AS tv
      |  FROM h
      |  WINDOW w AS (PARTITION BY win_start, event_type ORDER BY cents),
      |         p AS (PARTITION BY win_start, event_type)),
      |k AS (SELECT *, (19 * n + 19) // 20 AS k FROM t)
      |SELECT win_start, event_type, n,
      |  CAST(cents AS DOUBLE) / 100.0 AS p95,
      |  CASE WHEN n = k THEN NULL ELSE
      |    CAST(CAST(round(CAST(tv - cumv + (cum - k) * cents AS DOUBLE)
      |      / CAST(n - k AS DOUBLE) / 100.0 * 1e6) AS BIGINT) AS DOUBLE)
      |      / 1e6 END AS tail_mean
      |FROM k
      |WHERE cum >= k AND cum - cnt < k
      |ORDER BY win_start, event_type""".stripMargin
}
