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

  /** Two-sided CUSUM changepoint scan per series, gated as q_cusum:
    * the classic sequential statistic S⁺_t = max(0, S⁺_{t−1} + (x_t −
    * μ − k)) (and its downward mirror) — but computed WITHOUT the
    * sequential recursion, via the identity S⁺_t = P_t − min_{j≤t}
    * P_j where P is the prefix sum of slack-adjusted deviations: a
    * cumsum plus a running min, both single-pass window frames. The
    * peak of S⁺/S⁻ and its position locate the most likely upward /
    * downward level shift.
    *
    * Exactness: deviations are scaled by n (d_i = n·x_i − Σx − n·k, all
    * BIGINT cents) so the per-series mean never becomes a double;
    * prefix sums, running extrema and argmax (max-of-struct with
    * negated row number for earliest-tie) stay integer. The only
    * doubles are the two final displays (peak/n cents). Needs
    * n²·max|x| < 2⁶³ — fine to ~10⁷ rows per series at cent scale;
    * past that, pre-aggregate to coarser bars first.
    *
    * One user-keyed window shuffle (all frames share the sort), one
    * map-side-combinable per-user reduction. */
  def cusum(spark: SparkSession, dir: String, slackCents: Long = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wStat = Window.partitionBy(col("user_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("x", round(col("value") * 100).cast("long"))
      .withColumn("n", count(lit(1)).over(wStat))
      .withColumn("tot", sum(col("x")).over(wStat))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("p", sum(col("n") * col("x") - col("tot")).over(run))
      .withColumn("p_pos", col("p") - col("rn") * col("n") * slackCents)
      .withColumn("p_neg", col("p") + col("rn") * col("n") * slackCents)
      .withColumn("s_pos",
        col("p_pos") - least(lit(0L), min(col("p_pos")).over(run)))
      .withColumn("s_neg",
        greatest(lit(0L), max(col("p_neg")).over(run)) - col("p_neg"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n"),
        max(struct(col("s_pos").as("s"), (-col("rn")).as("neg_rn")))
          .as("pk_pos"),
        max(struct(col("s_neg").as("s"), (-col("rn")).as("neg_rn")))
          .as("pk_neg"))
      .select(col("user_id"), col("n"),
        round(col("pk_pos.s").cast("double") / col("n").cast("double"))
          .cast("long").as("peak_up_cents"),
        (-col("pk_pos.neg_rn")).as("peak_up_rn"),
        round(col("pk_neg.s").cast("double") / col("n").cast("double"))
          .cast("long").as("peak_down_cents"),
        (-col("pk_neg.neg_rn")).as("peak_down_rn"))
      .orderBy(col("user_id"))
  }

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

  /** Population stability index per event_type between the pre-/post-
    * `split` value distributions, over 10 equal-width bins whose range
    * comes from the REFERENCE slice (the deployed convention: the bin
    * edges are frozen with the reference, current data clamps into
    * them). PSI = Σ_b (p_c − p_r)·ln(p_c/p_r) with add-one smoothing so
    * empty bins are defined; all binning is integer arithmetic on
    * clamped non-negative cents (truncating vs flooring division can
    * never disagree), so both engines bin identically and the only
    * float work is the final 10-term sum.
    *
    * Shape: one stats aggregate per type (broadcast), one binned count
    * aggregate, a 10-row-per-type bin spine from `sequence` — no window
    * over raw rows, everything map-side combinable. */
  def psi(spark: SparkSession, dir: String,
      split: String = "2024-01-15 00:00:00", bins: Int = 10): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      (col("ts") < lit(split).cast("timestamp")).cast("long").as("is_ref"),
      round(col("value") * 100).cast("long").as("cents"))
    val refStats = ev.filter(col("is_ref") === 1L)
      .groupBy(col("event_type"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
        count(lit(1)).as("n_ref"))
    val curStats = ev.filter(col("is_ref") === 0L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_cur"))
    val binned = ev.join(broadcast(refStats), Seq("event_type"))
      .withColumn("bin", least(lit(bins - 1),
        (least(col("hi"), greatest(col("lo"), col("cents"))) - col("lo"))
          * bins / (col("hi") - col("lo") + 1)).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("is_ref")).as("nr"), sum(lit(1L) - col("is_ref")).as("nc"))
    // full bin spine: absent bins still contribute under smoothing
    val spine = refStats.join(broadcast(curStats), Seq("event_type"))
      .withColumn("bin", explode(sequence(lit(0L), lit(bins.toLong - 1))))
    spine.join(binned, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        ((coalesce(col("nr"), lit(0L)) + 1).cast("double")
          / (col("n_ref") + bins)).as("pr"),
        ((coalesce(col("nc"), lit(0L)) + 1).cast("double")
          / (col("n_cur") + bins)).as("pc"))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))), 6)
          .as("psi"))
      .orderBy(col("event_type"))
  }

  /** Mutual information + chi-square between event_type and a
    * fixed-width value bucket — the feature-association screen (is this
    * categorical feature informative about that numeric one?) next to
    * the distribution monitors above. Fixed-width buckets keep the
    * binning scan-local (no global sort, unlike a decile cut), the
    * contingency table is one map-side-combinable aggregate, marginals
    * ride windows over the ≤|types|·|buckets| CELLS, and both
    * statistics quantize each cell's float term to an integer before
    * summation (1e-9 nats / 1e-6 chi units) so the totals are
    * partitioning-invariant — only ln/÷ run in floating point, in
    * identical order on both engines. */
  def mutualInfo(spark: SparkSession, dir: String, width: Int = 10): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      floor(col("value") / width).cast("long").as("vbucket"))
    val cells = ev.groupBy(col("event_type"), col("vbucket"))
      .agg(count(lit(1)).as("nxy"))
    val c2 = cells
      .withColumn("nx", sum(col("nxy")).over(Window.partitionBy(col("event_type"))))
      .withColumn("ny", sum(col("nxy")).over(Window.partitionBy(col("vbucket"))))
      .withColumn("n", sum(col("nxy")).over(Window.partitionBy()))
    val ratio = (col("nxy").cast("double") * col("n").cast("double")) /
                (col("nx").cast("double") * col("ny").cast("double"))
    val miTerm = col("nxy") * round(log(ratio) * 1e9).cast("long")
    val e = (col("nx").cast("double") * col("ny").cast("double")) /
            col("n").cast("double")
    val d = col("nxy").cast("double") - e
    val chiTerm = round(d * d / e * 1e6).cast("long")
    c2.select(col("nxy"), col("n"), miTerm.as("mi_q"), chiTerm.as("chi_q"))
      .agg(count(lit(1)).as("n_cells"), max(col("n")).as("n_events"),
        sum(col("mi_q")).as("mi_s"), sum(col("chi_q")).as("chi_s"))
      .select(col("n_cells"), col("n_events"),
        round(col("mi_s").cast("double") / col("n_events").cast("double") / 1e9, 6)
          .as("mi_nats"),
        round(col("chi_s").cast("double") / 1e6, 6).as("chi2"))
  }

  /** Forecast-residual anomaly census — the monitoring op that closes
    * the Holt loop: one-step residuals r_t = x_t − (s_{t−1} + b_{t−1})
    * per series, a ROBUST threshold from their exact median/MAD
    * (outliers cannot inflate their own cutoff, unlike a stddev rule),
    * and the per-series count of |r − med| > k·MAD flags. Three passes
    * over the residual table (already one row per observation): median,
    * MAD given median, flag census — each a broadcast of a
    * |types|-row aggregate back onto the residuals, never a sort beyond
    * the shared series window. */
  def forecastAnomalies(spark: SparkSession, dir: String,
      alpha: Double = 0.5, beta: Double = 0.3, k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val resid = Tables.events(spark, dir)
      .filter(col("event_id") < 5000)
      .withColumn("h",
        graft.indicators.Holt(spark, col("value"), alpha, beta).over(w))
      .withColumn("pf", lag(col("h.level") + col("h.trend"), 1).over(w))
      .filter(col("pf").isNotNull)
      .select(col("event_type"), (col("value") - col("pf")).as("r"))
      .localCheckpoint() // three consumers; the window runs once
    val med = resid.groupBy(col("event_type"))
      .agg(expr("percentile(r, 0.5)").as("med"))
    val withMed = resid.join(broadcast(med), "event_type")
    val mad = withMed.groupBy(col("event_type"))
      .agg(expr("percentile(abs(r - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(min(col("med")), 6).as("med_resid"),
        round(min(col("mad")), 6).as("mad_resid"),
        sum(when(abs(col("r") - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_anomalies"))
      .select(col("event_type"), col("n"), col("med_resid"),
        col("mad_resid"), col("n_anomalies"),
        round(col("n_anomalies").cast("double") / col("n").cast("double"), 6)
          .as("anomaly_rate"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[psi]]. */
  val psiSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END
      |      AS is_ref,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |rs AS (SELECT event_type, min(cents) AS lo, max(cents) AS hi,
      |         count(*) AS n_ref
      |       FROM ev WHERE is_ref = 1 GROUP BY event_type),
      |cs AS (SELECT event_type, count(*) AS n_cur
      |       FROM ev WHERE is_ref = 0 GROUP BY event_type),
      |b AS (SELECT ev.event_type,
      |        least(9, (least(hi, greatest(lo, cents)) - lo) * 10
      |                 // (hi - lo + 1)) AS bin,
      |        CAST(sum(is_ref) AS BIGINT) AS nr,
      |        CAST(sum(1 - is_ref) AS BIGINT) AS nc
      |      FROM ev JOIN rs USING (event_type)
      |      GROUP BY ev.event_type, bin),
      |spine AS (SELECT rs.event_type, rs.n_ref, cs.n_cur, g.bin
      |          FROM rs JOIN cs USING (event_type)
      |          CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g),
      |p AS (SELECT s.event_type, s.n_ref, s.n_cur,
      |        CAST(coalesce(b.nr, 0) + 1 AS DOUBLE) / (s.n_ref + 10) AS pr,
      |        CAST(coalesce(b.nc, 0) + 1 AS DOUBLE) / (s.n_cur + 10) AS pc
      |      FROM spine s LEFT JOIN b USING (event_type, bin))
      |SELECT event_type,
      |  CAST(max(n_ref) AS BIGINT) AS n_ref,
      |  CAST(max(n_cur) AS BIGINT) AS n_cur,
      |  round(sum((pc - pr) * ln(pc / pr)), 6) AS psi
      |FROM p GROUP BY event_type
      |ORDER BY event_type""".stripMargin

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
