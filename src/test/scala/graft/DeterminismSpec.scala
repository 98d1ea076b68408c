package graft

import org.apache.spark.sql.DataFrame

/** The repo-wide exactness claim, tested directly: every gated query is
  * supposed to be PARTITIONING-INVARIANT (integer sums / quantized
  * boundaries / deterministic tiebreaks), so re-running under a
  * different shuffle-partition count — which reorders every float
  * accumulation and every merge — must produce byte-identical rows.
  * A query that silently depends on accumulation order passes its
  * single-layout oracle gate but fails here.
  *
  * The sample spans the risk classes: UDAF buffer merges (embed_cov),
  * iterative requantized loops (power_iter), libm-over-exact-integers
  * (kn_trigram, domain_shift), greedy argmax chains (mmr_rerank),
  * census ratios (simhash_acc, jl_distortion), and hash-membership
  * joins (bloom_fpr). */
class DeterminismSpec extends SparkSpec {

  private val sample: Seq[String] = Seq(
    "q_embed_cov", "q_power_iter", "q_pca_scores", "q_cov_drift",
    "q_kn_trigram", "q_domain_shift", "q_mmr_rerank", "q_simhash_acc",
    "q_jl_distortion", "q_bloom_fpr", "q_lid_confusion", "q_bmp_thumb",
    "q_wav_frames",
    // round 8: deflation loop, histogram sketch, Gear CDC (incl. the
    // two-snapshot diff), corpus-scaled planes, softmax reweighting
    "q_pca_topk", "q_quantile_sketch", "q_cdc_chunks", "q_cdc_dedup",
    "q_cdc_incremental", "q_plane_sweep", "q_domain_reweight",
    "q_knn_graph")

  private def rowsAt(parts: Int, name: String): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val df: DataFrame = SparkEntry.queries(name)(spark, sf)
      // canonical text form, order-insensitive (gates order their output,
      // but sort again so THIS spec only tests values, not row order)
      df.collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", 4)
  }

  test("gated queries are shuffle-partitioning invariant") {
    sample.foreach { name =>
      val a = rowsAt(3, name)
      val b = rowsAt(13, name)
      assert(a === b, s"$name differs between 3 and 13 shuffle partitions")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }

  /** The cross-engine representation rule, enforced at the schema level:
    * a gated DOUBLE produced by round(x, n) diverges between engines
    * when x sits on an exact n-dp half-way tie (different DuckDB builds
    * break ties in different directions vs Spark's BigDecimal HALF_UP)
    * or rounds a tiny negative to -0.0 (BigDecimal has no signed zero).
    * Both killed gates that were green locally (q_embed_cov,
    * q_pack_bins, round 7). tools/tie_scan.py strips the round()
    * wrappers from every oracle and scans the PRE-round values for
    * exact binary/shortest-repr ties and sign-splitting zeros; every
    * query it flagged was re-gated as quantized BIGINTs (_q4/_q6/_q7
    * suffix). This spec pins those schemas so a regression back to a
    * rounded DOUBLE gate fails loudly, and checks no gate emits a raw
    * FloatType (float→double promotion differs across engines). */
  private val quantizedGates: Map[String, Seq[String]] = Map(
    "q_embed_cov" -> Seq("cov_q6"),
    "q_power_iter" -> Seq("v_q6", "lambda_q6"),
    "q_pca_scores" -> Seq("score_q6"),
    "q_cov_drift" -> Seq("cov_a_q6", "cov_b_q6", "drift_q6", "frob_sq"),
    "q_pack_bins" -> Seq("fill_ppm"),
    "q_doc_features" -> Seq("avg_word_len_q6", "stopword_ratio_q6",
      "punct_ratio_q6", "quality_q6"),
    "q_quality_classifier" -> Seq("logit_q6"),
    "q_auc" -> Seq("auc_q6"),
    "q_confusion" -> Seq("precision_q6", "recall_q6", "f1_q6"),
    "q_pr_curve" -> Seq("score_cut_q6", "precision_q6", "recall_q6", "f1_q6"),
    "q_calibration" -> Seq("pos_rate_q6", "mean_score_q6"),
    "q_isotonic" -> Seq("pos_rate_q6", "iso_rate_q6"),
    "q_readability" -> Seq("flesch_q4", "fk_grade_q4"),
    "q_simhash_acc" -> Seq("mean_jacc_q6"),
    "q_exact_variance" -> Seq("var_value_q6"),
    "q_histogram" -> Seq("avg_value_q6"),
    "q_holt" -> Seq("level_q6", "trend_q6", "forecast_q6"),
    "q_mmr_rerank" -> Seq("rel_q6", "mmr_q7"),
    "q_indicators" -> Seq("sma_20_q6", "ema_20_q6", "rsi_14_q6", "macd_q6"),
    "q_rsi_wilder" -> Seq("avg_gain_q6", "avg_loss_q6", "rsi_wilder_q6"),
    "q_roll_spread" -> Seq("serial_cov_q6", "roll_spread_q6"),
    "q_tick_rule" -> Seq("ofi_q6"),
    "q_km_conversion" -> Seq("hazard_q6", "survival_q6"),
    "q_realized_vol" -> Seq("rv_q6", "vol_q6", "park_q6"))

  test("tie-hazard gates stay integer-quantized; no gate emits floats") {
    import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}
    quantizedGates.foreach { case (name, cols) =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      cols.foreach { c =>
        val f = schema.find(_.name == c)
        assert(f.isDefined, s"$name lost gated column $c")
        assert(f.get.dataType == LongType,
          s"$name.$c must stay BIGINT (tie-hazard class), got ${f.get.dataType}")
      }
      assert(!schema.exists(_.dataType == FloatType),
        s"$name emits a FloatType column")
    }
  }

}
