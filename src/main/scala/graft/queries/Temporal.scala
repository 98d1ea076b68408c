package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Time-series / sequence operators beyond the reference's indicator set —
  * the session-, interval- and path-shaped analytics a trading or event
  * pipeline needs (the reference stops at per-key rolling indicators,
  * `spark-streaming.py:164-194`).
  *
  * Exactness convention shared with [[Analytics]]: every cross-engine
  * comparison quantity is carried as integer cents / microseconds (BIGINT)
  * so window sums are order-independent and hash-identical across engines;
  * a final single division (BIGINT→DOUBLE) is IEEE-exact in both.
  *
  * Scale notes: every operator here is one window pass over a
  * `partitionBy(user_id …)` spec (one hash shuffle on the series key, the
  * same distribution reused by consecutive window layers — Catalyst
  * collapses same-spec windows into one sort), or one shuffle + one
  * map-side-combinable aggregation. Nothing materializes per-key state on
  * the driver.
  */
object Temporal {

  private val evOrder = Seq(col("ts"), col("event_id"))

  /** Event-value in exact integer cents. */
  private def cents(c: String = "value") =
    round(col(c) * 100).cast("long")

  // --------------------------------------------------------------------
  // Gaps-and-islands: merge overlapping activity intervals
  // --------------------------------------------------------------------

  /** Interval union per user: each event opens a 30-minute activity
    * interval `[ts, ts+30m)`; overlapping/touching intervals merge into
    * islands. Returns one row per merged island.
    *
    * The island boundary is `start > max(end of all previous intervals)`
    * — a running max over the preceding frame (NOT a lag of the previous
    * row's end: an earlier long interval can swallow several short
    * successors). Single window shuffle on user_id; all arithmetic in
    * epoch microseconds (BIGINT, exact). */
  def intervalMerge(spark: SparkSession, dir: String,
      widthUs: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    val prevMaxEnd = max(col("end_us"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) + widthUs).as("end_us"))
    ev.withColumn("new_island",
        when(prevMaxEnd.isNull || col("start_us") > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(
        timestamp_micros(min(col("start_us"))).as("island_start"),
        timestamp_micros(max(col("end_us"))).as("island_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("island"))
  }

  // --------------------------------------------------------------------
  // Max drawdown — the canonical risk metric over a cumulative P&L path
  // --------------------------------------------------------------------

  /** Per-user maximum drawdown of the cumulative event-value path:
    * `dd_t = max_{s<=t}(cum_s) - cum_t`, reported as the path maximum in
    * cents, with the running peak at the end of the series. Two stacked
    * same-spec windows (cumsum, then running max) → ONE sort/shuffle;
    * the per-user reduction is a plain map-side-combinable agg. */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("cum_cents", sum(cents()).over(w))
      .withColumn("peak_cents", max(col("cum_cents")).over(w))
      .groupBy(col("user_id"))
      .agg(
        max(col("peak_cents") - col("cum_cents")).as("max_drawdown_cents"),
        max(col("peak_cents")).as("peak_cents"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  // --------------------------------------------------------------------
  // First-order Markov transition matrix over event types
  // --------------------------------------------------------------------

  /** Global event-type transition counts and probabilities: for each user's
    * ts-ordered event sequence, count `(event_type -> next event_type)`
    * pairs, then normalize per source type. One window shuffle on user_id
    * (lead), one map-side-combinable count, one tiny broadcast-sized
    * normalization window over ~|types|² rows. The probability is a single
    * BIGINT/BIGINT division — IEEE-exact across engines. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    Tables.events(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
               col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // --------------------------------------------------------------------
  // Cumulative distinct users (growth curve)
  // --------------------------------------------------------------------

  /** Daily new-user and cumulative-distinct-user counts: distinct is
    * reduced to "first day per user" (one agg on user_id — exact, no
    * sketch), then a per-day count and a running sum over the day
    * sequence. The final window is over ~|days| rows — negligible; the
    * heavy lifting is the map-side-combinable min(day) per user. */
  def cumulativeDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"))
      .groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy(col("day"))

  // --------------------------------------------------------------------
  // Seasonality heatmap (the visualization-layer aggregate)
  // --------------------------------------------------------------------

  /** Day-of-week × hour-of-day activity heatmap: event counts, exact cents
    * volume, and distinct users per cell. 7×24 output cells — the classic
    * dashboard heatmap the reference's viz layer would render. Single
    * map-side-combinable aggregation; distinct users per cell is exact
    * (the cell count is bounded, the shuffle is on the 168 cell keys plus
    * user for the distinct). */
  def seasonality(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents()).as("cents"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("dow"), col("hod"))

  // --------------------------------------------------------------------
  // Weighted median (selection form — no interpolation, stays exact)
  // --------------------------------------------------------------------

  /** Weighted lower median of event value per event type, with
    * deterministic synthetic weights `(event_id % 7) + 1`: the smallest
    * value whose cumulative weight reaches half the total. Selection (not
    * interpolation) keeps the result a value from the data → exact across
    * engines. Two same-spec windows (cumulative weight, total) → one
    * shuffle on event_type; the argmin is a min over qualifying rows. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .withColumn("wt", (col("event_id") % 7 + 1).cast("long"))
      .withColumn("cum_wt",
        sum(col("wt")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot_wt",
        sum(col("wt")).over(Window.partitionBy(col("event_type"))))
    ev.filter(col("cum_wt") * 2 >= col("tot_wt"))
      .groupBy(col("event_type"))
      .agg(min(cents()).as("wmedian_cents"),
           max(col("tot_wt")).as("total_weight"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------------------------------
  // Time-weighted average price (TWAP)
  // --------------------------------------------------------------------

  /** Per-user TWAP of the event value: each observation holds until the
    * next one, so its weight is the holding duration — the metric VWAP's
    * volume weighting becomes when the axis is time (and what a plain
    * mean gets wrong whenever sampling is irregular). The weighted sum
    * is Σ(cents × duration_µs), a BIGINT product bounded by ~1e5 · 1e12
    * < 2⁶³ — exact and order-independent, so the one closing division
    * is the only float op on the comparison path. One lead-window pass
    * (shuffle on user_id) + one map-side-combinable agg; the last
    * observation of each series has no following tick and carries zero
    * weight (the standard open-interval convention). */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents().as("c"))
      .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur_us").isNotNull && col("dur_us") > 0)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("span_us"),
        round(sum(col("c") * col("dur_us")).cast("double")
          / sum(col("dur_us")).cast("double") / 100.0, 6).as("twap"))
      .orderBy(col("user_id"))
  }

  // --------------------------------------------------------------------
  // Rolling OLS slope (local trend strength)
  // --------------------------------------------------------------------

  /** 20-row rolling OLS slope of value-cents against the row index, per
    * (user_id, event_type) series — the local linear trend under each
    * point. All five moments (n, Σx, Σx², Σy, Σxy) are BIGINT window sums
    * over the same frame (x = row_number within the series, y = cents), so
    * the slope numerator/denominator are exact integers; the one division
    * at the end is IEEE-exact. Same-spec windows collapse to a single
    * sort + shuffle on the series key. */
  def rollingSlope(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val key = Seq(col("user_id"), col("event_type"))
    val w = Window.partitionBy(key: _*).orderBy(evOrder: _*)
    val f = w.rowsBetween(-(n - 1), 0)
    val ev = Tables.events(spark, dir)
      .withColumn("x", row_number().over(w).cast("long"))
      .withColumn("y", cents())
    val cnt = count(lit(1)).over(f)
    val sx = sum(col("x")).over(f)
    val sy = sum(col("y")).over(f)
    val sxx = sum(col("x") * col("x")).over(f)
    val sxy = sum(col("x") * col("y")).over(f)
    ev.withColumn("slope_cents",
        when(cnt === n,
          (lit(n) * sxy - sx * sy).cast("double") /
            (lit(n) * sxx - sx * sx).cast("double")))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
              col("slope_cents"))
      .orderBy(col("user_id"), col("event_type"), col("ts"), col("event_id"))
  }

  /** Daily realized volatility + Parkinson range estimator per series,
    * gated as q_realized_vol — the volatility measurements a trading
    * pipeline derives from tick data (the reference stops at RSI/MACD,
    * `spark-batch-processing.py:60-97`; RV is the standard next step).
    *
    * Realized variance Σ r² is an ORDER-SENSITIVE double sum, so the
    * log-returns are quantized to 1e-6 integer units first (the
    * [[graft.functions.CovAccum]] convention): Σ r_u² is an exact
    * BIGINT — associative, partitioning-invariant, engine-exact — and
    * the one 1e-12 division at the end is the same IEEE op in both
    * engines. Parkinson's σ_P = √(ln²(H/L) / 4ln2) uses the day's
    * exact max/min and a hardcoded 4·ln2 double so no libm constant
    * can drift.
    *
    * One window shuffle on the series key for the lag, then one
    * map-side-combinable (user, day) aggregate that shares the same
    * hash distribution prefix. Per-day return counts are bounded by
    * tick rate — no unbounded frames anywhere. */
  def realizedVol(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    val fourLn2 = 2.772588722239781 // 4*ln(2), pinned so libm can't drift
    Tables.events(spark, dir)
      .withColumn("prev", lag(col("value"), 1).over(w))
      // non-positive ticks have no log-return: explicit guard (Spark's
      // log already nulls them, but the oracle's ln(0) is -inf — the
      // guard keeps both engines on the same NULL)
      .withColumn("r_u",
        when(col("value") > 0 && col("prev") > 0,
          round((log(col("value")) - log(col("prev"))) * 1e6).cast("long")))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        count(col("r_u")).as("n_returns"),
        sum(col("r_u") * col("r_u")).as("rv_units"),
        max(col("value")).as("high"),
        min(col("value")).as("low"))
      // rv = rv_units/1e12 is an exact-integer ratio whose 6dp rounding
      // half-ties whenever rv_units ≡ 5e5 (mod 1e6) — structural; gate
      // all three as 1e-6-quantized BIGINTs (scale-0 round is portable)
      .select(col("user_id"), col("day"), col("n_returns"),
        round(col("rv_units").cast("double") / 1e12 * 1e6).cast("long")
          .as("rv_q6"),
        round(sqrt(col("rv_units").cast("double") / 1e12) * 1e6).cast("long")
          .as("vol_q6"),
        // Parkinson vol is undefined on a day whose low touches zero
        // (ANSI high/low would throw; the oracle's ln(inf) would too —
        // found when the noop bench first evaluated this column at
        // sf0.1): NULL, mirrored in the oracle
        when(col("low") > 0,
          round(sqrt(
            pow(round(log(col("high") / col("low")) * 1e6).cast("long")
              .cast("double"), 2) / 1e12 / fourLn2) * 1e6).cast("long"))
          .as("park_q6"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Per-(user, day) close in exact cents (rn=1 of the day-descending
    * order) and the day-over-day integer return vs the previous
    * OBSERVED day — the shared spine of [[marketBeta]] and [[leadLag]].
    * Two same-key window layers (Catalyst collapses them onto one
    * user-keyed shuffle); everything downstream is days × users
    * bounded. */
  private def dailyReturns(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
    val wDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val wSeries = Window.partitionBy(col("user_id")).orderBy(col("day"))
    ev.withColumn("rn", row_number().over(wDay))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), cents().as("close"))
      .withColumn("prev", lag(col("close"), 1).over(wSeries))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("day"), (col("close") - col("prev")).as("x"))
  }

  /** CAPM-style β and correlation of each series against the market
    * aggregate return, gated as q_market_beta. The market return per
    * day is the INTEGER sum of that day's user returns (inclusive of
    * the user — documented choice), broadcast back onto the per-user
    * frame; β = (nΣxm − ΣxΣm) / (nΣmm − (Σm)²) from exact BIGINT sums
    * with the two final divisions in double. Zero-variance series emit
    * null. Everything after the one user-keyed window shuffle is
    * days-bounded. */
  def marketBeta(spark: SparkSession, dir: String): DataFrame = {
    val rets = dailyReturns(spark, dir)
    val market = rets.groupBy(col("day")).agg(sum(col("x")).as("m"))
    rets.join(broadcast(market), Seq("day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("m")).as("sm"),
        sum(col("x") * col("m")).as("sxm"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("m") * col("m")).as("smm"))
      .select(col("user_id"), col("n_days"),
        when(col("n_days") * col("smm") - col("sm") * col("sm") === 0,
            lit(null).cast("double"))
          .otherwise(round(
            (col("n_days") * col("sxm") - col("sx") * col("sm")).cast("double")
              / (col("n_days") * col("smm") - col("sm") * col("sm")).cast("double"),
            6)).as("beta"),
        when((col("n_days") * col("smm") - col("sm") * col("sm")) === 0
            || (col("n_days") * col("sxx") - col("sx") * col("sx")) === 0,
            lit(null).cast("double"))
          .otherwise(round(
            (col("n_days") * col("sxm") - col("sx") * col("sm")).cast("double")
              / (sqrt((col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"))
                * sqrt((col("n_days") * col("smm") - col("sm") * col("sm")).cast("double"))),
            6)).as("corr"))
      .orderBy(col("user_id"))
  }

  /** Lead–lag cross-correlation, gated as q_lead_lag: corr of each
    * series' daily return x(d) against the market return m(d+k) for
    * k ∈ [−2, 2] — does the series LEAD (k>0 correlates) or FOLLOW the
    * market. The shifted joins fan the |days|-bounded market frame out
    * five ways (still broadcast-sized); sums are exact BIGINTs as in
    * [[marketBeta]]. 750 output rows at any corpus size — the classic
    * bounded-result quant diagnostic. */
  def leadLag(spark: SparkSession, dir: String, maxLag: Int = 2): DataFrame = {
    val rets = dailyReturns(spark, dir)
    val market = rets.groupBy(col("day")).agg(sum(col("x")).as("m"))
    val lags = spark.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("k"))
    val shifted = market.crossJoin(broadcast(lags))
      .select(date_add(col("day"), -col("k")).as("day"),
        col("k").cast("long").as("lag"), col("m"))
    rets.join(broadcast(shifted), Seq("day"))
      .groupBy(col("user_id"), col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("m")).as("sm"),
        sum(col("x") * col("m")).as("sxm"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("m") * col("m")).as("smm"))
      .select(col("user_id"), col("lag"), col("n_days"),
        when((col("n_days") * col("smm") - col("sm") * col("sm")) === 0
            || (col("n_days") * col("sxx") - col("sx") * col("sx")) === 0,
            lit(null).cast("double"))
          .otherwise(round(
            (col("n_days") * col("sxm") - col("sx") * col("sm")).cast("double")
              / (sqrt((col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"))
                * sqrt((col("n_days") * col("smm") - col("sm") * col("sm")).cast("double"))),
            6)).as("xcorr"))
      .orderBy(col("user_id"), col("lag"))
  }

  // --------------------------------------------------------------------
  // Market microstructure — spread, illiquidity, order flow, price impact
  // --------------------------------------------------------------------

  /** Roll (1984) implied effective spread per series, gated as
    * q_roll_spread: spread = 2·√(−cov(Δp_t, Δp_{t−1})) when the serial
    * covariance of price changes is negative (bid–ask bounce), null
    * otherwise. The reference's pipeline stops at rolling indicators
    * (`spark-batch-processing.py:60-97`); spread estimation is the
    * standard microstructure companion.
    *
    * Exactness: Δp in integer cents, so n·Σab − Σa·Σb is an exact
    * BIGINT; the only doubles are the final division and √. One
    * user-keyed window shuffle (two stacked lags collapse onto one
    * sort), then a map-side-combinable per-user aggregate. */
  def rollSpread(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    Tables.events(spark, dir)
      .withColumn("p", cents())
      .withColumn("d", col("p") - lag(col("p"), 1).over(w))
      .withColumn("dprev", lag(col("d"), 1).over(w))
      .filter(col("d").isNotNull && col("dprev").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("d")).as("sa"), sum(col("dprev")).as("sb"),
        sum(col("d") * col("dprev")).as("sab"))
      // 1e-6-quantized BIGINT gates: the exact-integer-ratio serial
      // covariance lands on genuine 6dp half-way ties (scanner-verified
      // at sf0.1), the q_pack_bins failure class
      .select(col("user_id"), col("n_pairs"),
        round((col("n_pairs") * col("sab") - col("sa") * col("sb")).cast("double")
            / (col("n_pairs") * col("n_pairs")).cast("double") * 1e6)
          .cast("long").as("serial_cov_q6"),
        when(col("n_pairs") * col("sab") - col("sa") * col("sb") < 0,
          round(lit(2.0) * sqrt(
            -(col("n_pairs") * col("sab") - col("sa") * col("sb")).cast("double")
              / (col("n_pairs") * col("n_pairs")).cast("double")) / 100.0 * 1e6))
          .cast("long").as("roll_spread_q6"))
      .orderBy(col("user_id"))
  }

  /** Amihud (2002) illiquidity per series, gated as q_amihud: the mean
    * over days of |daily return| / daily dollar volume — how much the
    * price moves per unit traded. Reuses the [[dailyReturns]] spine.
    *
    * The per-day ratio is two BIGINTs (|Δclose| cents over Σ|value|
    * cents) divided once in double, quantized to 1e-9 units (BIGINT) so
    * the cross-day mean is an exact integer sum — the averaging step
    * can never be order-sensitive. Daily volume shares the (user, day)
    * hash distribution with the close extraction; the final aggregate
    * is user-keyed and map-side combinable. */
  def amihud(spark: SparkSession, dir: String): DataFrame = {
    val rets = dailyReturns(spark, dir)
    val vol = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(cents()).as("vol_cents"))
      .filter(col("vol_cents") > 0)
    rets.join(vol, Seq("user_id", "day"))
      .withColumn("ratio_nanos",
        round(abs(col("x")).cast("double") * 1e9
          / col("vol_cents").cast("double")).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"), sum(col("ratio_nanos")).as("sr"))
      .select(col("user_id"), col("n_days"),
        round(col("sr").cast("double") / col("n_days").cast("double") / 1e9, 6)
          .as("amihud"))
      .orderBy(col("user_id"))
  }

  /** Tick-rule trade classification + daily order-flow imbalance, gated
    * as q_tick_rule: each tick is signed by the direction of its price
    * change, with zero-ticks inheriting the LAST NONZERO direction
    * (`last(ignoreNulls)` over the preceding frame — the Lee–Ready
    * zero-tick convention); ticks before any direction is known drop.
    * OFI_day = (buy$ − sell$) / (buy$ + sell$) over tick-signed dollar
    * volume.
    *
    * One user-keyed window shuffle (lag + running last collapse onto a
    * single sort), then a (user, day) aggregate on the same key prefix.
    * Buy/sell sums are exact BIGINT cents; OFI is one final division. */
  def tickRule(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    Tables.events(spark, dir)
      .withColumn("p", cents())
      .withColumn("d", col("p") - lag(col("p"), 1).over(w))
      .withColumn("raw_sign",
        when(col("d") > 0, 1L).when(col("d") < 0, -1L))
      .withColumn("sign",
        last(col("raw_sign"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("sign").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("sign") === 1, col("p")).otherwise(0L)).as("buy_cents"),
        sum(when(col("sign") === -1, col("p")).otherwise(0L)).as("sell_cents"),
        count(lit(1)).as("n_ticks"))
      // ofi is a ratio of exact cent BIGINTs — dyadic denominators put
      // it in the 6dp half-tie class (scanner-verified at sf0.1)
      .select(col("user_id"), col("day"), col("n_ticks"),
        col("buy_cents"), col("sell_cents"),
        when(col("buy_cents") + col("sell_cents") > 0,
          round((col("buy_cents") - col("sell_cents")).cast("double")
            / (col("buy_cents") + col("sell_cents")).cast("double") * 1e6))
          .cast("long").as("ofi_q6"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Kaplan–Meier time-to-conversion, gated as q_km_conversion: the
    * duration is HOURS from a user's first event to their first
    * 'purchase', administratively censored at a 48-hour observation
    * window — a user converting later (or never) is censored at 48 h
    * but still counts in every risk set up to the cut, which is exactly
    * what a naive conversion-rate table gets wrong. S(t) = Π_{s≤t}
    * (1 − d_s/n_s) over conversion times.
    *
    * Exactness: the product is carried in LOG space quantized to 1e-6
    * integer units — each per-duration term round(ln((n−d)/n)·1e6) is
    * one deterministic double op (the realized-vol quantized-ln
    * convention), the running sum is an exact BIGINT, and one exp at
    * the end recovers S(t). d=0 rows contribute exactly 0; a terminal
    * row where every remaining user converts emits S=0 directly.
    *
    * Scale: the per-user reduction is map-side combinable; everything
    * after lives on the per-duration table, bounded by the OBSERVATION
    * WINDOW (≤ windowHours+1 rows at any corpus size), so the global
    * ordered window over it is the documented bounded-table exception
    * (the classifierAuc rationale), not an unbounded single-task sort. */
  def kmConversion(spark: SparkSession, dir: String, windowHours: Int = 48): DataFrame = {
    val hourUs = 3600L * 1000000
    val lifetimes = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("conv_us"))
      .select(floor((col("conv_us") - col("first_us")) / hourUs).as("h"))
      .select(
        when(col("h").isNotNull && col("h") <= windowHours, col("h"))
          .otherwise(lit(windowHours.toLong)).as("dur"),
        when(col("h").isNotNull && col("h") <= windowHours, 1L)
          .otherwise(0L).as("observed"))
    val wAll = Window.orderBy(col("dur")) // bounded: one row per distinct duration
    lifetimes.groupBy(col("dur"))
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c_censored"),
        count(lit(1)).as("total"))
      .withColumn("n_at_risk",
        sum(col("total")).over(wAll.rowsBetween(0, Window.unboundedFollowing)))
      .withColumn("ln_units",
        when(col("d") === 0, 0L)
          .when(col("d") < col("n_at_risk"),
            round(log((col("n_at_risk") - col("d")).cast("double")
              / col("n_at_risk").cast("double")) * 1e6).cast("long")))
      .withColumn("cum_ln",
        sum(col("ln_units")).over(wAll.rowsBetween(Window.unboundedPreceding, 0)))
      // hazard is an exact count ratio (6dp half-tie class,
      // scanner-verified at sf0.1); survival quantizes with it
      .select(col("dur"), col("n_at_risk"), col("d"), col("c_censored"),
        round(col("d").cast("double") / col("n_at_risk").cast("double") * 1e6)
          .cast("long").as("hazard_q6"),
        when(col("d") === col("n_at_risk"), lit(0L))
          .otherwise(round(exp(col("cum_ln").cast("double") / 1e6) * 1e6)
            .cast("long"))
          .as("survival_q6"))
      .orderBy(col("dur"))
  }

  /** Multi-touch attribution, gated as q_attribution: every 'purchase'
    * distributes its revenue over the user's preceding touchpoints
    * (click / view / signup) within a 7-day lookback, under two
    * models at once — LINEAR (equal split) and TIME-DECAY (weight
    * halves per whole day of age) — reported as credited revenue per
    * channel. The credit a channel report assigns is the canonical
    * warehouse query the reference's dashboard layer would need.
    *
    * Exactness: decay weights are DYADIC — w = 10⁶ / 2^⌊age days⌋,
    * an exact integer for ages ≤ 6 days (15625·2⁶ = 10⁶) — so no
    * transcendental appears anywhere; per-purchase credit units are
    * one deterministic double division rounded to BIGINT, and the
    * cross-purchase channel sums are exact integer adds. Display is a
    * single BIGINT/1e8 division to dollars.
    *
    * Scale: one user-keyed equi-join (time predicate as a post-join
    * filter on the same shuffle; AQE handles user skew), one window
    * over per-purchase partitions (bounded by touches-per-7-days), one
    * map-side-combinable channel aggregate. */
  def attribution(spark: SparkSession, dir: String,
      lookbackDays: Int = 7): DataFrame = {
    val dayUs = 86400L * 1000000
    val ev = Tables.events(spark, dir)
    val touches = ev
      .filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type").as("channel"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pus"),
        col("event_id").as("pid"),
        round(col("value") * 100).cast("long").as("v_cents"))
    // (user_id, pid): event_id alone need not stay unique under corpus
    // replication; the compound key keeps purchase partitions disjoint
    val wp = Window.partitionBy(col("user_id"), col("pid"))
    purchases.join(touches, Seq("user_id"))
      .filter(col("tus") < col("pus")
        && col("tus") >= col("pus") - lookbackDays * dayUs)
      .withColumn("age_days",
        floor((col("pus") - col("tus")) / dayUs).cast("int"))
      .withColumn("wu",
        (lit(1000000L) / expr("shiftleft(1L, age_days)")).cast("long"))
      .withColumn("n_t", count(lit(1)).over(wp))
      .withColumn("swu", sum(col("wu")).over(wp))
      .withColumn("linear_units",
        round(col("v_cents").cast("double") * 1e6
          / col("n_t").cast("double")).cast("long"))
      .withColumn("decay_units",
        round((col("v_cents") * col("wu")).cast("double") * 1e6
          / col("swu").cast("double")).cast("long"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        (sum(col("linear_units")).cast("double") / 1e8).as("linear_rev"),
        (sum(col("decay_units")).cast("double") / 1e8).as("decay_rev"))
      .orderBy(col("channel"))
  }

  /** Hurst exponent by rescaled-range analysis, gated as q_hurst: for
    * block sizes s ∈ {8,16,32}, each series' log-returns are cut into
    * complete s-blocks, R/S = (range of cumulative deviations) / (block
    * std) is averaged in log space per scale, and H is the slope of
    * mean ln(R/S) against ln(s) — closed-form (y₃₂ − y₈)/(2·ln 2) since
    * the three x-points are equally spaced in ln 2 units. H ≈ 0.5 for a
    * random walk, > 0.5 trending, < 0.5 mean-reverting.
    *
    * Exactness: returns are 1e-6 log-units (BIGINT); within a block the
    * scaled cumulative deviation s·Y_i = s·cum_i − i·Σr and the scaled
    * variance s·Σr² − (Σr)² are exact BIGINTs (the s factors cancel in
    * R/S), so each block's ln(R/S) is ONE double expression, quantized
    * to 1e-6 units before the cross-block mean (exact integer sum).
    * ln 2 is pinned so libm cannot drift the final slope.
    *
    * Scale: one user-keyed window for returns; the 3× scale fan-out
    * stays in-row; block windows partition on (user, scale, block) with
    * ≤ 32 rows per partition — bounded frames everywhere, and the final
    * aggregate is user-keyed and map-side combinable. */
  def hurst(spark: SparkSession, dir: String): DataFrame = {
    val ln2 = 0.6931471805599453
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    val rets = Tables.events(spark, dir)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .withColumn("r",
        round((log(col("value")) - log(col("prev"))) * 1e6).cast("long"))
      .filter(col("r").isNotNull)
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("rn"), col("r"))
    val blocks = rets
      .withColumn("s", explode(array(lit(8L), lit(16L), lit(32L))))
      .withColumn("blk", expr("(rn - 1) DIV s"))
      .withColumn("i", (col("rn") - 1) % col("s") + 1)
    val wb = Window.partitionBy(col("user_id"), col("s"), col("blk"))
    val perBlock = blocks
      .withColumn("cum", sum(col("r")).over(wb.orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("r")).over(wb))
      .withColumn("sy", col("s") * col("cum") - col("i") * col("tot"))
      .groupBy(col("user_id"), col("s"), col("blk"))
      .agg(count(lit(1)).as("cnt"),
        max(col("sy")).as("max_sy"), min(col("sy")).as("min_sy"),
        sum(col("r") * col("r")).as("sum_r2"), max(col("tot")).as("tot"))
      .filter(col("cnt") === col("s"))
      .filter(col("s") * col("sum_r2") - col("tot") * col("tot") > 0)
      .withColumn("rs_units",
        round(log((col("max_sy") - col("min_sy")).cast("double")
          / sqrt((col("s") * col("sum_r2") - col("tot") * col("tot"))
            .cast("double"))) * 1e6).cast("long"))
    // Per-scale mean is re-quantized to integer 1e-6 units (round to
    // INTEGER is engine-stable; round(x, 6) is not — Spark's BigDecimal
    // path and DuckDB's multiply path disagree 1 ulp at .5 boundaries),
    // so every reported double is an exact BIGINT / 1e6.
    val perScale = perBlock.groupBy(col("user_id"), col("s"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("rs_units")).as("su"))
      .withColumn("mu",
        round(col("su").cast("double") / col("n_blocks").cast("double"))
          .cast("long"))
    perScale.groupBy(col("user_id"))
      .agg(
        max(when(col("s") === 8, col("n_blocks"))).as("n8"),
        max(when(col("s") === 16, col("n_blocks"))).as("n16"),
        max(when(col("s") === 32, col("n_blocks"))).as("n32"),
        max(when(col("s") === 8, col("mu"))).as("m8u"),
        max(when(col("s") === 16, col("mu"))).as("m16u"),
        max(when(col("s") === 32, col("mu"))).as("m32u"))
      .filter(col("n8").isNotNull && col("n16").isNotNull && col("n32").isNotNull)
      .select(col("user_id"), col("n8"), col("n16"), col("n32"),
        (col("m8u").cast("double") / 1e6).as("rs8"),
        (col("m16u").cast("double") / 1e6).as("rs16"),
        (col("m32u").cast("double") / 1e6).as("rs32"),
        (round((col("m32u") - col("m8u")).cast("double") / (2 * ln2))
          .cast("long").cast("double") / 1e6).as("hurst"))
      .orderBy(col("user_id"))
  }

  /** Kyle (1985) lambda per series, gated as q_kyle_lambda: the OLS
    * slope of price change on signed dollar volume — the price impact
    * per traded dollar. Signs come from the same tick rule as
    * [[tickRule]]; the regression uses only ticks where both the price
    * change and a direction are defined.
    *
    * Exactness: x = sign·cents and y = Δcents are BIGINTs, so the OLS
    * numerator/denominator (nΣxy − ΣxΣy, nΣxx − (Σx)²) are exact; one
    * double division at the end, null on a degenerate (constant-x)
    * series. Same single-shuffle shape as [[marketBeta]]. */
  def kyleLambda(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
    Tables.events(spark, dir)
      .withColumn("p", cents())
      .withColumn("d", col("p") - lag(col("p"), 1).over(w))
      .withColumn("raw_sign",
        when(col("d") > 0, 1L).when(col("d") < 0, -1L))
      .withColumn("sign",
        last(col("raw_sign"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("sign").isNotNull && col("d").isNotNull)
      .withColumn("x", col("sign") * col("p"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("x")).as("sx"), sum(col("d")).as("sy"),
        sum(col("x") * col("d")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("user_id"), col("n_ticks"),
        when(col("n_ticks") * col("sxx") - col("sx") * col("sx") === 0,
            lit(null).cast("double"))
          .otherwise(round(
            (col("n_ticks") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n_ticks") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6)).as("kyle_lambda"))
      .orderBy(col("user_id"))
  }

  /** Historical VaR and expected shortfall, gated as q_var_es: the
    * 95% lower-tail order statistic of per-event value and the mean of
    * the tail at/below it, per event type — the portfolio-risk readout
    * every trading pipeline batch-computes nightly.
    *
    * Exact order statistics WITHOUT a per-key row sort: the rows
    * collapse to a (type, cents) histogram first (one map-side
    * combinable aggregate over the scan), and the k-th smallest is
    * found by a running-count window over that histogram — a frame
    * bounded by DISTINCT cent values per type (value-domain-sized,
    * corpus-independent), the same shape the calibration/perplexity
    * deciles use. ES is then integer algebra on the same row: tail sum
    * = (cum value mass strictly below the VaR bucket) + (remaining k −
    * n_below draws) · var_cents, so ties at the VaR boundary are
    * handled exactly. k = ⌈αn⌉ computed in integers ((n+19)/20 for
    * α=0.05); the only doubles are the two final divisions. */
  def varEs(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = byType.orderBy(col("cents"))
    h.withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("cumv", sum(col("cnt") * col("cents")).over(cum))
      .withColumn("n", sum(col("cnt")).over(byType))
      .withColumn("k", expr("(n + 19) div 20")) // integer ceil(n/20)
      // the bucket holding the k-th smallest: first cum >= k
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("event_type"), col("n"), col("k"),
        (col("cents").cast("double") / 100.0).as("var95"),
        (round((col("cumv") - col("cnt") * col("cents")
            + (col("k") - (col("cum") - col("cnt"))) * col("cents"))
            .cast("double") / col("k").cast("double") / 100.0 * 1e6)
          .cast("long").cast("double") / 1e6).as("es95"))
      .orderBy(col("event_type"))
  }

  /** Winsorization census, gated as q_winsorize: per event type, the
    * P05/P95 clip points and the winsorized mean — the standard
    * heavy-tail taming step before feature scaling (metrics pipelines
    * winsorize revenue-like columns so one whale doesn't own the
    * gradient). Same exact-order-statistic histogram machinery as
    * [[varEs]] (value-domain-bounded window, zero per-key row sorts);
    * the winsorized SUM is then pure integer algebra over the same
    * histogram — total − tail masses + clip · tail counts — so the mean
    * is exact at any scale, not a resampled approximation. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // histogram feeds picks + rollup
    val byType = Window.partitionBy(col("event_type"))
    val cum = byType.orderBy(col("cents"))
    val marked = h
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("cumv", sum(col("cnt") * col("cents")).over(cum))
      .withColumn("n", sum(col("cnt")).over(byType))
    def pick(kExpr: Column, name: String): DataFrame = marked
      .withColumn("k", kExpr)
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("event_type"), col("cents").as(name),
        // mass and value strictly below the clip point
        (col("cum") - col("cnt")).as(s"${name}_nlo"),
        (col("cumv") - col("cnt") * col("cents")).as(s"${name}_vlo"))
    val lo = pick(expr("(n + 19) div 20"), "p05c")          // ceil(.05 n)
    val hi = pick(expr("(19 * n + 19) div 20"), "p95c")     // ceil(.95 n)
    val tot = h.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"), sum(col("cnt") * col("cents")).as("sv"),
        max(col("cents")).as("maxc"))
    val above = h.join(broadcast(hi.select(col("event_type"), col("p95c"))),
        "event_type")
      .filter(col("cents") > col("p95c"))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("nhi"), sum(col("cnt") * col("cents")).as("vhi"))
    tot.join(broadcast(lo), "event_type")
      .join(broadcast(hi.select(col("event_type"), col("p95c"))), "event_type")
      .join(above, Seq("event_type"), "left")
      .select(col("event_type"), col("n"),
        (col("p05c").cast("double") / 100.0).as("p05"),
        (col("p95c").cast("double") / 100.0).as("p95"),
        col("p05c_nlo").as("clipped_low"),
        coalesce(col("nhi"), lit(0L)).as("clipped_high"),
        (round((col("sv") - col("p05c_vlo")
            + col("p05c_nlo") * col("p05c")
            - coalesce(col("vhi"), lit(0L))
            + coalesce(col("nhi"), lit(0L)) * col("p95c"))
            .cast("double") / col("n").cast("double") / 100.0 * 1e6)
          .cast("long").cast("double") / 1e6).as("win_mean"))
      .orderBy(col("event_type"))
  }

  /** CUPED-adjusted A/B readout, gated as q_ab_cuped: the standard
    * variance-reduction estimator for online experiments (Deng et al.,
    * WSDM'13) — regress each user's experiment-period purchase value on
    * their PRE-period value and report per-variant means/variances of
    * the adjusted metric alongside the raw one.
    *
    * Setup on the synthetic corpus: variant = `user_id % 2` (the
    * deterministic hash-bucket assignment an experimentation platform
    * uses), pre/post split at the integer-microsecond midpoint of the
    * corpus time range, metric = per-user purchase cents in each half.
    * theta is the pooled OLS slope cov(x,y)/var(x).
    *
    * Exactness: per-user x/y are BIGINT cent sums; the pooled and
    * per-variant moment sums (sx, sy, sxx, sxy, syy) accumulate as
    * DECIMAL(38,0) — exact and order-independent at any scale (x·x for
    * a whale user overflows BIGINT long before it dents a 38-digit
    * decimal). theta, means and variances are then single double
    * expressions over those integers, mirrored symbol-for-symbol in the
    * oracle; CUPED algebra turns per-row adjustment into moment algebra
    * (mean_adj = ȳ_v − θ(x̄_v − x̄); var_adj = var_y − 2θcov + θ²var_x),
    * so NO per-row double ever exists.
    *
    * Scale shape: one groupBy(user) over the scan (the shuffle CUPED
    * inherently needs), then a 2-key map-side-combinable census and
    * 2-row window math. The midpoint is one min/max aggregate broadcast
    * back — never a driver round-trip in the plan. */
  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        round(col("value") * 100).cast("long").as("cents"))
    val mid = e.agg(
      ((min(col("tus")) + max(col("tus"))) / lit(2L)).cast("long").as("mid"))
    val per = e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("tus") <= col("mid"), col("cents")).otherwise(0L))
          .as("x"),
        sum(when(col("tus") > col("mid"), col("cents")).otherwise(0L))
          .as("y"))
      .select((col("user_id") % 2).cast("int").as("variant"),
        col("x").cast(dec).as("x"), col("y").cast(dec).as("y"))
    val cen = per.groupBy(col("variant")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val all = Window.partitionBy() // 2-row frame: one row per variant
    def d(c: Column): Column = c.cast("double")
    def q6(c: Column): Column =
      round(c * 1e6).cast("long").cast("double") / 1e6
    cen
      .withColumn("gn", sum(col("n")).over(all))
      .withColumn("gsx", sum(col("sx")).over(all))
      .withColumn("gsy", sum(col("sy")).over(all))
      .withColumn("gsxx", sum(col("sxx")).over(all))
      .withColumn("gsxy", sum(col("sxy")).over(all))
      // pooled OLS slope of y on x, cents domain
      .withColumn("theta",
        (d(col("gn")) * d(col("gsxy")) - d(col("gsx")) * d(col("gsy")))
          / (d(col("gn")) * d(col("gsxx")) - d(col("gsx")) * d(col("gsx"))))
      .withColumn("mean_y", d(col("sy")) / d(col("n")) / 100.0)
      .withColumn("mean_cuped",
        (d(col("sy")) / d(col("n"))
          - col("theta") * (d(col("sx")) / d(col("n"))
            - d(col("gsx")) / d(col("gn")))) / 100.0)
      .withColumn("var_y",
        (d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n")))
          / (d(col("n")) - 1.0) / 10000.0)
      .withColumn("cov_xy",
        (d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n")))
          / (d(col("n")) - 1.0) / 10000.0)
      .withColumn("var_x",
        (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n")))
          / (d(col("n")) - 1.0) / 10000.0)
      .withColumn("var_cuped",
        col("var_y") - lit(2.0) * col("theta") * col("cov_xy")
          + col("theta") * col("theta") * col("var_x"))
      .select(col("variant"), col("n").cast("long").as("n"),
        q6(col("theta")).as("theta"),
        q6(col("mean_y")).as("mean_y"),
        q6(col("mean_cuped")).as("mean_cuped"),
        q6(col("var_y")).as("var_y"),
        q6(col("var_cuped")).as("var_cuped"),
        q6(lit(1.0) - col("var_cuped") / col("var_y")).as("var_reduction"))
      .orderBy(col("variant"))
  }
}
