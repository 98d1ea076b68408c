package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches the two-pass explode formulation on real data") {
    val got = Pca.embedCov(spark, sf)
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // independent reference: explode + spark built-ins, same quantization
    val cells = graft.util.Tables.embeddings(spark, sf)
      .select($"vec_id", posexplode($"embedding").as(Seq("i0", "xf")))
      .select($"vec_id", $"i0",
        round($"xf".cast("double") * 100000).cast("long").as("xq"))
    val want = cells.select($"vec_id", $"i0".as("a"), $"xq".as("xa"))
      .join(cells.select($"vec_id", $"i0".as("b"), $"xq".as("xb")), Seq("vec_id"))
      .filter($"a" <= $"b")
      .groupBy($"a", $"b")
      .agg(sum($"xa" * $"xb").as("sij"), count(lit(1)).as("n"),
        sum($"xa").as("sa"), sum($"xb").as("sb"))
      .select($"a", $"b", round(($"sij".cast("double")
        - $"sa".cast("double") * $"sb".cast("double") / $"n".cast("double"))
        / $"n".cast("double") / 1e10 * 1e6).cast("long").as("cov_q6"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === want.size)
    for ((k, w) <- want) assert(got(k) === w, s"cell $k")
  }

  test("diagonal is non-negative and the matrix has full upper triangle") {
    val rows = Pca.embedCov(spark, sf).as[(Int, Int, Long)].collect()
    assert(rows.length === 64 * 65 / 2)
    assert(rows.filter(r => r._1 == r._2).forall(_._3 >= 0L))
  }

  test("power iteration recovers a planted dominant direction") {
    // corpus = s·u + small noise, eigengap huge → 8 steps converge
    val d = 8
    val u = Array.tabulate(d)(i => if (i % 2 == 0) 0.5f else -0.25f)
    val rows = (0 until 400).map { r =>
      val s = ((r % 21) - 10) / 10.0f // symmetric spread in [-1, 1]
      val noise = Array.tabulate(d)(i =>
        (((r * 31 + i * 17) % 13) - 6) / 1300.0f)
      (r.toLong, Array.tabulate(d)(i => s * u(i) + noise(i)).toSeq, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("pca-spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Pca.powerIter(spark, dir, d = d, iters = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val v = out.map(_._2 / 1e6) // v_q6 is the iterate in 1e-6 units
    val lambda = out.head._3 / 1e6
    // compare against u normalized to max-|component| = 1 (the iterate's
    // normalization), sign-fixed like the operator (component 0 ≥ 0)
    val umax = u.map(math.abs(_)).max
    val un = u.map(x => x / umax * math.signum(u(0)))
    for (i <- 0 until d)
      assert(math.abs(v(i) - un(i)) < 0.02, s"component $i: ${v(i)} vs ${un(i)}")
    // lambda ≈ Var(s)·‖u‖² in the planted model (noise is tiny)
    val svals = (0 until 400).map(r => ((r % 21) - 10) / 10.0)
    val varS = svals.map(x => x * x).sum / 400.0 -
      math.pow(svals.sum / 400.0, 2)
    val expect = varS * u.map(x => x.toDouble * x).sum
    assert(math.abs(lambda - expect) / expect < 0.05,
      s"lambda $lambda vs planted $expect")

    // apply face: the variance of the centered PC1 scores must equal
    // λ·‖v‖² (the defining property of projecting onto the eigenvector)
    val scores = Pca.pcaScores(spark, dir, d = d, iters = 8)
      .as[(Long, Long)].collect().map(_._2 / 1e6)
    assert(scores.length === 400)
    val mean = scores.sum / scores.length
    assert(math.abs(mean) < 1e-6, s"scores not centered: $mean")
    val varScore = scores.map(x => (x - mean) * (x - mean)).sum / scores.length
    val vnorm2 = v.map(x => x * x).sum
    assert(math.abs(varScore - lambda * vnorm2) / (lambda * vnorm2) < 0.01,
      s"Var(score)=$varScore vs lambda*|v|^2=${lambda * vnorm2}")
  }

  test("pcaTopK: deflation recovers two planted orthogonal directions") {
    // corpus = s·u + t·w + tiny noise with Var(s) >> Var(t) and u ⊥ w:
    // component 1 must align with u, component 2 with w, λ1 > λ2 > λ3,
    // and the recovered directions must stay near-orthogonal
    val d = 8
    val u = Array(0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5)
    val w = Array(0.5, 0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5)
    val rows = (0 until 400).map { r =>
      val s = ((r % 21) - 10) / 10.0
      // independent counter (r/21 steps once per full s cycle) — a
      // shared modulus would correlate the factors and tilt the basis
      val t = (((r / 21) % 21) - 10) / 30.0 // 1/3 the spread of s
      val noise = Array.tabulate(d)(i =>
        (((r * 31 + i * 17) % 13) - 6) / 2600.0)
      (r.toLong,
        Array.tabulate(d)(i => (s * u(i) + t * w(i) + noise(i)).toFloat).toSeq,
        0)
    }
    val dir = java.nio.file.Files.createTempDirectory("pca-topk").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Pca.pcaTopK(spark, dir, d = d, iters = 8, k = 3)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.length === 3 * d)
    val comps = out.groupBy(_._1).map { case (c, rs) =>
      c -> rs.sortBy(_._2).map(_._3 / 1e6)
    }
    val lams = out.groupBy(_._1).map { case (c, rs) => c -> rs.head._4 }
    assert(lams(1) > lams(2) && lams(2) > lams(3),
      s"eigenvalues not descending: $lams")
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(math.abs(cosine(comps(1).toSeq, u.toSeq)) > 0.999,
      s"component 1 not aligned with planted u: ${comps(1).toSeq}")
    assert(math.abs(cosine(comps(2).toSeq, w.toSeq)) > 0.999,
      s"component 2 not aligned with planted w: ${comps(2).toSeq}")
    assert(math.abs(cosine(comps(1).toSeq, comps(2).toSeq)) < 0.01,
      "recovered components not orthogonal")
    // component 1 must agree with the single-component gate
    val one = Pca.powerIter(spark, dir, d = d, iters = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(one.map(_._2).toSeq === out.filter(_._1 == 1).sortBy(_._2)
      .map(_._3).toSeq, "component 1 diverges from powerIter")
  }

  test("covariance drift localizes a planted per-split scale change") {
    // even vec_ids: base corpus; odd vec_ids: same distribution with
    // dimension 3 amplified 2x → drift concentrates on cells touching 3
    val d = 6
    val rows = (0 until 600).map { r =>
      val base = Array.tabulate(d)(i => (((r / 2) * 37 + i * 23) % 41 - 20) / 50.0f)
      if (r % 2 == 1) base(3) = base(3) * 2.0f
      (r.toLong, base.toSeq, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("covdrift").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Pca.covDrift(spark, dir, d = d, topN = 5)
      .as[(Int, Int, Long, Long, Long, Long)].collect()
    assert(out.length === 5)
    // the top drifted cell is the amplified variance cell (3,3): var
    // quadruples there while cross terms only double
    assert((out.head._1, out.head._2) === ((3, 3)))
    assert(out.head._4.toDouble > out.head._3.toDouble * 3.5,
      "split-1 variance should ~4x")
    // every top-5 drifted cell touches dimension 3
    assert(out.forall(c => c._1 == 3 || c._2 == 3))
    assert(out.head._6 > 0L) // Frobenius alarm fires
  }
}
