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
    "q_wav_frames")

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
}
