package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.CovAccum
import graft.util.Tables

/** Distributed PCA preprocessing for the embedding pipeline: the exact
  * covariance matrix in ONE corpus pass (no row explosion — see
  * [[graft.functions.CovAccum]]), and the top principal component via a
  * fixed-iteration power method on the d²-bounded matrix.
  *
  * Why it matters at 100 TB: PCA / whitening is the standard step
  * before IVF/PQ indexing (rotate to decorrelated axes so product
  * quantizer subspaces carry equal energy) and before low-rank
  * compression of an embedding corpus. The corpus-scale cost is
  * exactly one aggregate pass with O(d²) state; everything after —
  * centering algebra, power iterations, Rayleigh quotient — runs on
  * d² = 4096 cells, bounded regardless of corpus size (the same
  * boundedness argument as the k-centroid loops in `Similarity`).
  *
  * Exactness shape: components quantize to 1e-5 BIGINTs, the aggregate
  * emits exact integer sums, and every downstream float step is a
  * closed-form function of those integers (deterministic — identical
  * doubles in Spark and the oracle), re-quantized at each iteration
  * boundary so the next integer stage is engine-portable.
  */
object Pca {

  /** Quantized component vectors: array<long> of round(x·1e5). */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      transform(col("embedding"),
        e => round(e.cast("double") * 100000).cast("long")).as("q"))

  /** Mean-centered covariance cells (i0 ≤ j upper triangle) from the
    * packed one-pass sums: cov = (Sij − Si·Sj/n) / n / 1e10. */
  private def covCells(spark: SparkSession, dir: String, d: Int): DataFrame = {
    val covUdf = udaf(new CovAccum(d), ExpressionEncoder[Seq[Long]]())
    val packed = quantized(spark, dir).agg(covUdf(col("q")).as("m"))
    val pairs = spark.range(d).select(col("id").cast("int").as("i0"))
      .crossJoin(spark.range(d).select(col("id").cast("int").as("j")))
      .filter(col("i0") <= col("j"))
      // packed layout: [n | d dim-sums | d(d+1)/2 row-major upper cross-sums]
      .withColumn("tri",
        col("i0") * d - col("i0") * (col("i0") - 1) / 2 + (col("j") - col("i0")))
    pairs.crossJoin(packed) // 1-row aggregate against d²/2 bounded pairs
      .select(col("i0"), col("j"),
        element_at(col("m"), lit(1)).as("n"),
        element_at(col("m"), (col("i0") + 2).cast("int")).as("si"),
        element_at(col("m"), (col("j") + 2).cast("int")).as("sj"),
        element_at(col("m"), (col("tri") + 2 + d).cast("int")).as("sij"))
      .select(col("i0"), col("j"),
        ((col("sij").cast("double")
          - col("si").cast("double") * col("sj").cast("double") / col("n").cast("double"))
          / col("n").cast("double") / 1e10).as("covr"))
  }

  /** Gated covariance matrix: (i0, j, cov_q6) upper triangle in exact
    * 1e-6-quantized BIGINTs. A 6dp DOUBLE gate here failed the driver's
    * hash on a single -0.0 cell (DuckDB rounds a tiny negative
    * covariance to signed zero; Spark's BigDecimal HALF_UP has no
    * signed zero) — integers have no signed zero, so the quantized
    * gate is engine-portable. This is the same 1e6 quantization the
    * power iteration already feeds on. */
  def embedCov(spark: SparkSession, dir: String, d: Int = 64): DataFrame =
    covCells(spark, dir, d)
      .select(col("i0"), col("j"),
        round(col("covr") * 1e6).cast("long").as("cov_q6"))
      .orderBy(col("i0"), col("j"))

  /** Top principal component by `iters` power-method steps from the
    * all-ones start, plus the Rayleigh-quotient eigenvalue estimate.
    *
    * Each step is matvec → max-|·| normalize → re-quantize to 1e6
    * integers, so every iteration's input is exact integers on both
    * engines; the eigenvector sign is fixed by forcing component 0
    * non-negative (power iteration is sign-ambiguous). The iterate is
    * lineage-truncated per step (lazily — construction stays
    * analysis-only) because each tiny d-row frame is read twice by the
    * next step. No convergence claim is gated — the gate asserts the
    * deterministic arithmetic; PcaSpec asserts convergence on a
    * planted-spike corpus where the eigengap makes 8 steps sufficient. */
  def powerIter(spark: SparkSession, dir: String, d: Int = 64,
      iters: Int = 8): DataFrame = {
    val covq = covCells(spark, dir, d)
      .select(col("i0"), col("j"), round(col("covr") * 1e6).cast("long").as("cq"))
      .localCheckpoint(eager = false) // one corpus pass feeds 8 iterations
    val fullm = covq.union(
      covq.filter(col("i0") =!= col("j"))
        .select(col("j").as("i0"), col("i0").as("j"), col("cq")))
    var v = spark.range(d).select(col("id").cast("int").as("j"),
      lit(1000000L).as("vq"))
    for (_ <- 1 to iters) {
      val mv = fullm.join(v, Seq("j"))
        .groupBy(col("i0")).agg(sum(col("cq") * col("vq")).as("mv"))
        .localCheckpoint(eager = false) // read by the max and the rescale
      val mx = mv.agg(max(abs(col("mv"))).as("mx"))
      v = mv.crossJoin(mx)
        .select(col("i0").as("j"),
          round(col("mv").cast("double") / col("mx").cast("double") * 1e6)
            .cast("long").as("vq"))
        .localCheckpoint(eager = false)
    }
    val sg = v.filter(col("j") === 0)
      .select(when(col("vq") < 0, lit(-1L)).otherwise(lit(1L)).as("sg"))
    // Rayleigh quotient vᵀCv / vᵀv on the exact integer iterate; the
    // per-cell triple product fits a long, the 4096-cell sum gets
    // DECIMAL(38,0) headroom (same convention as ExactMoments' note)
    val num = fullm
      .join(v.select(col("j").as("i0"), col("vq").as("va")), Seq("i0"))
      .join(v.select(col("j"), col("vq").as("vb")), Seq("j"))
      .agg(sum((col("cq") * col("va") * col("vb")).cast("decimal(38,0)")).as("nu"))
    val den = v.agg(sum(col("vq") * col("vq")).as("de"))
    // Gate in exact integers: v_q6 is the sign-fixed iterate itself
    // (already a 1e-6-quantized BIGINT — no float on the comparison
    // path), lambda_q6 = round(nu/de) is the Rayleigh quotient in the
    // same 1e-6 units (the /1e6 display scale and *1e6 quantization
    // cancel). The double division nu/de is IEEE-identical on both
    // engines; quantizing to BIGINT removes the signed-zero /
    // decimal-tie representation hazards a 6dp DOUBLE gate carries.
    v.crossJoin(sg).crossJoin(num).crossJoin(den)
      .select(col("j"),
        (col("vq") * col("sg")).as("v_q6"),
        round(col("nu").cast("double") / col("de").cast("double"))
          .cast("long").as("lambda_q6"))
      .orderBy(col("j"))
  }

  /** Top-k principal components by DEFLATION on the d²-bounded integer
    * matrix, gated as q_pca_topk — the whitening rotation PQ/IVF
    * indexing actually consumes (one component is a score; k components
    * are the rotation). After each power-iteration convergence the
    * matrix is rank-1 deflated, C ← C − λ·v·vᵀ/(vᵀv), and the next
    * component runs the same 8-step loop on the deflated matrix.
    *
    * Exactness discipline (the q_power_iter convention, applied at
    * every boundary): the matrix stays 1e-6-quantized BIGINTs between
    * components — each deflation cell update is ONE double chain
    * ((λ_q6 · va) · vb / de) rounded back to BIGINT, with λ_q6 the
    * already-quantized Rayleigh quotient and de = Σvq² the exact
    * integer norm (the iterate is max-normalized, NOT unit — dividing
    * by de is what makes the rank-1 subtraction actually annihilate v).
    * The oracle unrolls the identical k×iters CTE chain.
    *
    * Scale: everything after the one-pass covariance aggregate runs on
    * d² = 4096 cells × k components — bounded regardless of corpus
    * size; the corpus is scanned exactly once. */
  def pcaTopK(spark: SparkSession, dir: String, d: Int = 64,
      iters: Int = 8, k: Int = 3): DataFrame = {
    val covq = covCells(spark, dir, d)
      .select(col("i0"), col("j"), round(col("covr") * 1e6).cast("long").as("cq"))
      .localCheckpoint(eager = false)
    var fullm = covq.union(
      covq.filter(col("i0") =!= col("j"))
        .select(col("j").as("i0"), col("i0").as("j"), col("cq")))
      .localCheckpoint(eager = false)
    var out: DataFrame = null
    for (c <- 1 to k) {
      var v = spark.range(d).select(col("id").cast("int").as("j"),
        lit(1000000L).as("vq"))
      for (_ <- 1 to iters) {
        val mv = fullm.join(v, Seq("j"))
          .groupBy(col("i0")).agg(sum(col("cq") * col("vq")).as("mv"))
          .localCheckpoint(eager = false)
        val mx = mv.agg(max(abs(col("mv"))).as("mx"))
        v = mv.crossJoin(mx)
          .select(col("i0").as("j"),
            round(col("mv").cast("double") / col("mx").cast("double") * 1e6)
              .cast("long").as("vq"))
          .localCheckpoint(eager = false)
      }
      val sg = v.filter(col("j") === 0)
        .select(when(col("vq") < 0, lit(-1L)).otherwise(lit(1L)).as("sg"))
      val vfix = v.crossJoin(sg)
        .select(col("j"), (col("vq") * col("sg")).as("vq"))
        .localCheckpoint(eager = false) // read by gate, Rayleigh, deflation
      val num = fullm
        .join(vfix.select(col("j").as("i0"), col("vq").as("va")), Seq("i0"))
        .join(vfix.select(col("j"), col("vq").as("vb")), Seq("j"))
        .agg(sum((col("cq") * col("va") * col("vb")).cast("decimal(38,0)")).as("nu"))
      val den = vfix.agg(sum(col("vq") * col("vq")).as("de"))
      val lam = num.crossJoin(den)
        .select(round(col("nu").cast("double") / col("de").cast("double"))
          .cast("long").as("lam"), col("de"))
      val comp = vfix.crossJoin(lam)
        .select(lit(c).as("component"), col("j"),
          col("vq").as("v_q6"), col("lam").as("lambda_q6"))
      out = if (out == null) comp else out.union(comp)
      if (c < k) {
        fullm = fullm
          .join(vfix.select(col("j").as("i0"), col("vq").as("va")), Seq("i0"))
          .join(vfix.select(col("j"), col("vq").as("vb")), Seq("j"))
          .crossJoin(lam)
          .select(col("i0"), col("j"),
            (col("cq") - round(col("lam").cast("double") * col("va").cast("double")
              * col("vb").cast("double") / col("de").cast("double")).cast("long"))
              .as("cq"))
          .localCheckpoint(eager = false) // next component reads it 8+2 times
      }
    }
    out.orderBy(col("component"), col("j"))
  }

  /** Covariance-DRIFT monitor: per-split covariance matrices from ONE
    * grouped CovAccum pass (two packed buffers, not two corpus scans),
    * compared cell-by-cell — the second-moment face of the ks_drift /
    * psi family. A mean-only monitor misses the failure mode embedding
    * pipelines actually hit (an encoder redeploy that rotates the space
    * keeps every per-dimension mean but scrambles correlations); the
    * top-drifted cells name the dimension pairs that moved, and the
    * Frobenius norm is the one-number alarm threshold.
    *
    * Splits here are vec_id parity (deterministic stand-ins for "last
    * epoch vs this epoch"). Drift ordering and the Frobenius sum run on
    * 1e-6-quantized integer deltas — exact ordering, engine-portable. */
  def covDrift(spark: SparkSession, dir: String, d: Int = 64,
      topN: Int = 20): DataFrame = {
    val covUdf = udaf(new CovAccum(d), ExpressionEncoder[Seq[Long]]())
    val packed = Tables.embeddings(spark, dir)
      .select((col("vec_id") % 2).cast("int").as("split"),
        transform(col("embedding"),
          e => round(e.cast("double") * 100000).cast("long")).as("q"))
      .groupBy(col("split")).agg(covUdf(col("q")).as("m"))
    val pairs = spark.range(d).select(col("id").cast("int").as("i0"))
      .crossJoin(spark.range(d).select(col("id").cast("int").as("j")))
      .filter(col("i0") <= col("j"))
      .withColumn("tri",
        col("i0") * d - col("i0") * (col("i0") - 1) / 2 + (col("j") - col("i0")))
    // Quantize per-split covariances to 1e-6 BIGINTs at the source —
    // the drift delta, its ordering, the Frobenius sum AND the gated
    // columns are then all exact integers (the earlier 6dp DOUBLE
    // cov_a/cov_b gate carried the same -0.0 / decimal-tie hazard
    // embedCov hit; frob is gated as the exact squared sum rather than
    // a rounded sqrt for the same reason).
    val c = pairs.crossJoin(packed) // 2-row aggregate side: broadcast NL, bounded
      .select(col("split"), col("i0"), col("j"),
        element_at(col("m"), lit(1)).as("n"),
        element_at(col("m"), (col("i0") + 2).cast("int")).as("si"),
        element_at(col("m"), (col("j") + 2).cast("int")).as("sj"),
        element_at(col("m"), (col("tri") + 2 + d).cast("int")).as("sij"))
      .select(col("split"), col("i0"), col("j"),
        round((col("sij").cast("double")
          - col("si").cast("double") * col("sj").cast("double") / col("n").cast("double"))
          / col("n").cast("double") / 1e10 * 1e6).cast("long").as("covq"))
      .localCheckpoint(eager = false) // both split slices read it
    val ab = c.filter(col("split") === 0)
      .select(col("i0"), col("j"), col("covq").as("cov_a_q6"))
      .join(c.filter(col("split") === 1)
        .select(col("i0"), col("j"), col("covq").as("cov_b_q6")), Seq("i0", "j"))
      .withColumn("dq", abs(col("cov_a_q6") - col("cov_b_q6")))
    val fr = ab.agg(sum(col("dq") * col("dq")).as("s2"))
    ab.crossJoin(fr)
      .orderBy(col("dq").desc, col("i0"), col("j")).limit(topN)
      .select(col("i0"), col("j"), col("cov_a_q6"), col("cov_b_q6"),
        col("dq").as("drift_q6"), col("s2").as("frob_sq"))
  }

  /** The APPLY face: centered PC1 score per vector — the projection a
    * whitening/compression pipeline writes back to the corpus. The
    * eigenvector is folded to a ONE-ROW array (collect_list over d
    * bounded rows, broadcast), so the corpus pass is a zero-shuffle
    * zip_with/aggregate dot product in whole-stage codegen — no driver
    * collect (construction stays analysis-only) and no per-row join.
    * Centering uses Σ_rows raw = Σ_i Si·v_i, so the mean term is the
    * corpus total of the same exact integer dot product — one extra
    * 1-row aggregate instead of a second d-sum pass. */
  def pcaScores(spark: SparkSession, dir: String, d: Int = 64,
      iters: Int = 8): DataFrame = {
    // vq·sg in 1e-6 units — the gated v_q6 column IS the exact iterate
    val vfin = powerIter(spark, dir, d, iters)
      .select(col("j"), col("v_q6").as("vqs"))
    val varr = vfin
      .agg(array_sort(collect_list(struct(col("j"), col("vqs")))).as("p"))
      .select(transform(col("p"), s => s.getField("vqs")).as("varr"))
    val scored = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          e => round(e.cast("double") * 100000).cast("long")).as("q"))
      .crossJoin(broadcast(varr))
      .select(col("vec_id"),
        aggregate(zip_with(col("q"), col("varr"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("raw"))
    val tot = scored.agg(sum(col("raw")).as("s"), count(lit(1)).as("n"))
    // score_q6 = round((raw − mean)/1e5): the 6dp score in exact 1e-6
    // BIGINT units ((…/1e11 display scale)·(1e6 quantization) = /1e5).
    // Centered scores cross zero, so a 6dp DOUBLE gate would hit the
    // -0.0 representation split embedCov hit — integers cannot.
    scored.crossJoin(tot)
      .select(col("vec_id"),
        round((col("raw").cast("double")
          - col("s").cast("double") / col("n").cast("double")) / 1e5)
          .cast("long").as("score_q6"))
      .orderBy(col("vec_id"))
  }

  // ---- DuckDB oracle builders (generated: the power iteration unrolls
  // one CTE pair per step, so hand-maintaining it would drift) ----

  /** Shared prefix: quantized cells, per-dim sums, upper-tri cross sums. */
  private def oracleCtes: String =
    """WITH cells AS MATERIALIZED (
      |  SELECT vec_id, i - 1 AS i0,
      |    CAST(round(CAST(e AS DOUBLE) * 100000) AS BIGINT) AS xq
      |  FROM (SELECT vec_id, unnest(embedding) AS e,
      |          generate_subscripts(embedding, 1) AS i
      |        FROM embeddings)),
      |sums AS (SELECT i0, sum(xq) AS s, count(*) AS n FROM cells GROUP BY i0),
      |crossp AS MATERIALIZED (
      |  SELECT a.i0 AS i0, b.i0 AS j, sum(a.xq * b.xq) AS sij
      |  FROM cells a JOIN cells b ON a.vec_id = b.vec_id AND a.i0 <= b.i0
      |  GROUP BY a.i0, b.i0)""".stripMargin

  private def covExpr: String =
    """(CAST(c.sij AS DOUBLE)
      |      - CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE) / CAST(sa.n AS DOUBLE))
      |      / CAST(sa.n AS DOUBLE) / 1e10""".stripMargin

  def embedCovSql: String =
    s"""$oracleCtes
       |SELECT CAST(c.i0 AS INTEGER) AS i0, CAST(c.j AS INTEGER) AS j,
       |  CAST(round(($covExpr) * 1e6) AS BIGINT) AS cov_q6
       |FROM crossp c JOIN sums sa ON sa.i0 = c.i0 JOIN sums sb ON sb.i0 = c.j
       |ORDER BY i0, j""".stripMargin

  /** Full CTE chain up to the final iterate v{iters}. */
  private def powerCtes(d: Int, iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""mv$k AS MATERIALIZED (SELECT f.i0 AS i0, sum(f.cq * v.vq) AS mv
         |  FROM fullm f JOIN v${k - 1} v ON v.j = f.j GROUP BY f.i0),
         |v$k AS MATERIALIZED (SELECT CAST(i0 AS INTEGER) AS j,
         |  CAST(round(CAST(mv AS DOUBLE)
         |    / CAST((SELECT max(abs(mv)) FROM mv$k) AS DOUBLE) * 1e6) AS BIGINT) AS vq
         |  FROM mv$k)""".stripMargin
    }.mkString(",\n")
    s"""$oracleCtes,
       |covq AS MATERIALIZED (
       |  SELECT c.i0, c.j,
       |    CAST(round($covExpr * 1e6) AS BIGINT) AS cq
       |  FROM crossp c JOIN sums sa ON sa.i0 = c.i0 JOIN sums sb ON sb.i0 = c.j),
       |fullm AS MATERIALIZED (SELECT i0, j, cq FROM covq UNION ALL
       |          SELECT j AS i0, i0 AS j, cq FROM covq WHERE i0 <> j),
       |v0 AS MATERIALIZED (SELECT CAST(unnest(range(0, $d)) AS INTEGER) AS j,
       |       CAST(1000000 AS BIGINT) AS vq),
       |$steps""".stripMargin
  }

  def powerIterSql(d: Int = 64, iters: Int = 8): String =
    s"""${powerCtes(d, iters)}
       |SELECT v.j,
       |  CAST(v.vq * s.sg AS BIGINT) AS v_q6,
       |  CAST(round(CAST(n.nu AS DOUBLE) / CAST(dd.de AS DOUBLE)) AS BIGINT)
       |    AS lambda_q6
       |FROM v$iters v
       |CROSS JOIN (SELECT CASE WHEN vq < 0 THEN CAST(-1 AS BIGINT)
       |                        ELSE CAST(1 AS BIGINT) END AS sg
       |            FROM v$iters WHERE j = 0) s
       |CROSS JOIN (SELECT sum(f.cq * a.vq * b.vq) AS nu FROM fullm f
       |            JOIN v$iters a ON a.j = f.i0
       |            JOIN v$iters b ON b.j = f.j) n
       |CROSS JOIN (SELECT sum(vq * vq) AS de FROM v$iters) dd
       |ORDER BY v.j""".stripMargin

  /** Generated oracle for [[pcaTopK]]: the full k-component deflation
    * chain unrolled — per component the 8 power steps, sign fix,
    * Rayleigh quotient, and the rank-1-deflated matrix for the next. */
  def pcaTopKSql(d: Int = 64, iters: Int = 8, k: Int = 3): String = {
    def compCtes(c: Int): String = {
      val mat = s"fullm$c"
      val steps = (1 to iters).map { s =>
        s"""c${c}mv$s AS MATERIALIZED (SELECT f.i0 AS i0, sum(f.cq * v.vq) AS mv
           |  FROM $mat f JOIN c${c}v${s - 1} v ON v.j = f.j GROUP BY f.i0),
           |c${c}v$s AS MATERIALIZED (SELECT CAST(i0 AS INTEGER) AS j,
           |  CAST(round(CAST(mv AS DOUBLE)
           |    / CAST((SELECT max(abs(mv)) FROM c${c}mv$s) AS DOUBLE) * 1e6)
           |    AS BIGINT) AS vq
           |  FROM c${c}mv$s)""".stripMargin
      }.mkString(",\n")
      val deflate = if (c < k)
        s""",
           |fullm${c + 1} AS MATERIALIZED (
           |  SELECT f.i0, f.j,
           |    f.cq - CAST(round(CAST(l.lam AS DOUBLE) * CAST(a.vq AS DOUBLE)
           |      * CAST(b.vq AS DOUBLE) / CAST(l.de AS DOUBLE)) AS BIGINT) AS cq
           |  FROM fullm$c f
           |  JOIN c${c}fix a ON a.j = f.i0
           |  JOIN c${c}fix b ON b.j = f.j
           |  CROSS JOIN c${c}lam l)""".stripMargin
      else ""
      s"""c${c}v0 AS MATERIALIZED (
         |  SELECT CAST(unnest(range(0, $d)) AS INTEGER) AS j,
         |  CAST(1000000 AS BIGINT) AS vq),
         |$steps,
         |c${c}sg AS (SELECT CASE WHEN vq < 0 THEN CAST(-1 AS BIGINT)
         |                        ELSE CAST(1 AS BIGINT) END AS sg
         |            FROM c${c}v$iters WHERE j = 0),
         |c${c}fix AS MATERIALIZED (
         |  SELECT v.j, CAST(v.vq * s.sg AS BIGINT) AS vq
         |  FROM c${c}v$iters v CROSS JOIN c${c}sg s),
         |c${c}lam AS MATERIALIZED (
         |  SELECT CAST(round(CAST(n.nu AS DOUBLE) / CAST(dd.de AS DOUBLE))
         |           AS BIGINT) AS lam,
         |         dd.de AS de
         |  FROM (SELECT sum(f.cq * a.vq * b.vq) AS nu FROM fullm$c f
         |        JOIN c${c}fix a ON a.j = f.i0
         |        JOIN c${c}fix b ON b.j = f.j) n
         |  CROSS JOIN (SELECT sum(vq * vq) AS de FROM c${c}fix) dd)$deflate"""
        .stripMargin
    }
    val selects = (1 to k).map { c =>
      s"""SELECT $c AS component, f.j, f.vq AS v_q6, l.lam AS lambda_q6
         |FROM c${c}fix f CROSS JOIN c${c}lam l""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$oracleCtes,
       |covq AS MATERIALIZED (
       |  SELECT c.i0, c.j,
       |    CAST(round($covExpr * 1e6) AS BIGINT) AS cq
       |  FROM crossp c JOIN sums sa ON sa.i0 = c.i0 JOIN sums sb ON sb.i0 = c.j),
       |fullm1 AS MATERIALIZED (SELECT i0, j, cq FROM covq UNION ALL
       |          SELECT j AS i0, i0 AS j, cq FROM covq WHERE i0 <> j),
       |${(1 to k).map(compCtes).mkString(",\n")}
       |$selects
       |ORDER BY component, j""".stripMargin
  }

  def covDriftSql(topN: Int = 20): String =
    s"""WITH cells AS MATERIALIZED (
       |  SELECT vec_id, CAST(vec_id % 2 AS INTEGER) AS split, i - 1 AS i0,
       |    CAST(round(CAST(e AS DOUBLE) * 100000) AS BIGINT) AS xq
       |  FROM (SELECT vec_id, unnest(embedding) AS e,
       |          generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |sums AS (SELECT split, i0, sum(xq) AS s, count(*) AS n
       |         FROM cells GROUP BY split, i0),
       |crossp AS MATERIALIZED (
       |  SELECT a.split, a.i0 AS i0, b.i0 AS j, sum(a.xq * b.xq) AS sij
       |  FROM cells a JOIN cells b ON a.vec_id = b.vec_id AND a.i0 <= b.i0
       |  GROUP BY a.split, a.i0, b.i0),
       |cov2 AS MATERIALIZED (
       |  SELECT c.split, c.i0, c.j,
       |    CAST(round(($covExpr) * 1e6) AS BIGINT) AS covq
       |  FROM crossp c
       |  JOIN sums sa ON sa.split = c.split AND sa.i0 = c.i0
       |  JOIN sums sb ON sb.split = c.split AND sb.i0 = c.j),
       |ab AS MATERIALIZED (
       |  SELECT a.i0, a.j, a.covq AS cov_a_q6, b.covq AS cov_b_q6,
       |    abs(a.covq - b.covq) AS dq
       |  FROM cov2 a JOIN cov2 b ON a.i0 = b.i0 AND a.j = b.j
       |  WHERE a.split = 0 AND b.split = 1)
       |SELECT CAST(ab.i0 AS INTEGER) AS i0, CAST(ab.j AS INTEGER) AS j,
       |  ab.cov_a_q6, ab.cov_b_q6,
       |  dq AS drift_q6,
       |  CAST(fr.s2 AS BIGINT) AS frob_sq
       |FROM ab CROSS JOIN (SELECT sum(dq * dq) AS s2 FROM ab) fr
       |ORDER BY dq DESC, i0, j LIMIT $topN""".stripMargin

  def pcaScoresSql(d: Int = 64, iters: Int = 8): String =
    s"""${powerCtes(d, iters)},
       |vfin AS MATERIALIZED (
       |  SELECT v.j, v.vq * s.sg AS vqs FROM v$iters v
       |  CROSS JOIN (SELECT CASE WHEN vq < 0 THEN CAST(-1 AS BIGINT)
       |                          ELSE CAST(1 AS BIGINT) END AS sg
       |              FROM v$iters WHERE j = 0) s),
       |scores AS MATERIALIZED (
       |  SELECT c.vec_id, sum(c.xq * f.vqs) AS raw
       |  FROM cells c JOIN vfin f ON f.j = c.i0 GROUP BY c.vec_id)
       |SELECT s.vec_id,
       |  CAST(round((CAST(s.raw AS DOUBLE)
       |    - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)) / 1e5) AS BIGINT)
       |    AS score_q6
       |FROM scores s
       |CROSS JOIN (SELECT sum(raw) AS s, count(*) AS n FROM scores) t
       |ORDER BY s.vec_id""".stripMargin
}
