package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Data-quality / drift monitoring over the event stream — the checks a
  * production ingestion pipeline runs per batch window before promoting
  * data downstream.
  */
object Monitor {

  /** Two-sample Kolmogorov–Smirnov drift statistic per event_type:
    * D = max_v |F_ref(v) − F_cur(v)| between the value distribution
    * before and after `split`.
    *
    * Computed exactly in integers: with per-value cumulative counts
    * (cr, cc) and totals (Nr, Nc), D = max |cr·Nc − cc·Nr| / (Nr·Nc) —
    * the max runs over BIGINT products, one double division at the end,
    * so Spark and the oracle agree bit-for-bit. The integer products
    * need Nr·max(cr) < 2⁶³: fine to ~3e9 rows per group; past that,
    * switch the numerator to doubles (the statistic tolerates 1-ulp
    * noise; the gate corpus does not need to).
    *
    * One groupBy on (type, value-cents) with map-side combine, then
    * windows per type — no join, no driver-side distribution. */
  def ksDrift(spark: SparkSession, dir: String,
      split: String = "2024-01-15 00:00:00"): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      (col("ts") < lit(split).cast("timestamp")).cast("long").as("is_ref"),
      round(col("value") * 100).cast("long").as("cents"))
    val counts = ev.groupBy(col("event_type"), col("cents"))
      .agg(sum(col("is_ref")).as("nr"), sum(lit(1L) - col("is_ref")).as("nc"))
    val byVal = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val whole = Window.partitionBy(col("event_type"))
    counts
      .withColumn("cr", sum(col("nr")).over(byVal))
      .withColumn("cc", sum(col("nc")).over(byVal))
      .withColumn("n_ref", sum(col("nr")).over(whole))
      .withColumn("n_cur", sum(col("nc")).over(whole))
      .groupBy(col("event_type"))
      .agg(
        max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        max(abs(col("cr") * col("n_cur") - col("cc") * col("n_ref")))
          .as("d_int"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(col("d_int") / (col("n_ref") * col("n_cur")).cast("double"), 6)
          .as("ks"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[ksDrift]]. */
  val ksDriftSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END
      |      AS is_ref,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |c AS (SELECT event_type, cents,
      |        CAST(sum(is_ref) AS BIGINT) AS nr,
      |        CAST(sum(1 - is_ref) AS BIGINT) AS nc
      |      FROM ev GROUP BY event_type, cents),
      |w AS (SELECT event_type,
      |        sum(nr) OVER (PARTITION BY event_type ORDER BY cents) AS cr,
      |        sum(nc) OVER (PARTITION BY event_type ORDER BY cents) AS cc,
      |        sum(nr) OVER (PARTITION BY event_type) AS n_ref,
      |        sum(nc) OVER (PARTITION BY event_type) AS n_cur
      |      FROM c)
      |SELECT event_type,
      |  CAST(max(n_ref) AS BIGINT) AS n_ref,
      |  CAST(max(n_cur) AS BIGINT) AS n_cur,
      |  round(max(abs(cr * n_cur - cc * n_ref))
      |        / CAST(max(n_ref) * max(n_cur) AS DOUBLE), 6) AS ks
      |FROM w GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
