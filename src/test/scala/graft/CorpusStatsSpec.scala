package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs: pair counts bounded by dfs; PMI consistent with exact recount") {
    val out = TextAnalysis.pmiPairs(spark, sf, vocabSize = 10, minPairs = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, nab, dfa, dfb, _) =>
      a < b && nab <= math.min(dfa, dfb) })
    // recompute one pair's co-occurrence count by brute force
    val (a, b, nab, _, _, _) = out.head
    val brute = graft.util.Tables.documents(spark, sf)
      .select(array_distinct(split($"text", " ")).as("t"))
      .filter(array_contains($"t", a) && array_contains($"t", b))
      .count()
    assert(brute === nab)
  }

  test("pmiPairs restricts to the top-V vocabulary") {
    val v = 5
    val out = TextAnalysis.pmiPairs(spark, sf, vocabSize = v, minPairs = 1)
    val terms = out.select($"a").union(out.select($"b"))
      .distinct().as[String].collect().toSet
    assert(terms.size <= v)
  }

  test("readability: counts exact on a known text; scores follow the formula") {
    val r = TextAnalysis.readability(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.forall { case (_, w, s, y, flQ4, fkQ4) =>
      w > 0 && s > 0 && y > 0 &&
        math.abs(flQ4 / 1e4 - (206.835 - 1.015 * w / s - 84.6 * y / w)) < 1e-3 &&
        math.abs(fkQ4 / 1e4 - (0.39 * w / s + 11.8 * y / w - 15.59)) < 1e-3 })
    // spot-check the syllable heuristic: vowel runs, not vowel chars
    val doc = graft.util.Tables.documents(spark, sf)
      .orderBy($"doc_id").select($"text").as[String].head()
    val sylls = "[aeiouy]+".r.findAllIn(doc).size.max(1)
    assert(r.minBy(_._1)._4 === sylls)
  }

  test("jsDivergence: brute-force twin on one pair; symmetric domain, [0, ln2] bound") {
    val out = TextAnalysis.jsDivergence(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, shared, jsd) =>
      assert(a < b, "each unordered pair exactly once, lexicographic")
      assert(shared > 0)
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-9, s"($a,$b): $jsd")
    }
    // from-scratch recompute (union support, textbook formula) for the
    // first pair — the op's inner-join + exclusive-mass identity must
    // agree with the naive full-support sum
    val (pa, pb, _, got) = out.head
    val counts = graft.util.Tables.documents(spark, sf)
      .filter($"source".isin(pa, pb))
      .select($"source", explode(split($"text", " ")).as("w"))
      .groupBy($"source", $"w").count()
      .as[(String, String, Long)].collect()
    def dist(src: String): Map[String, Double] = {
      val g = counts.filter(_._1 == src)
      val n = g.map(_._3).sum.toDouble
      g.map(r => r._2 -> r._3 / n).toMap
    }
    val (dp, dq) = (dist(pa), dist(pb))
    val naive = (dp.keySet ++ dq.keySet).toSeq.map { w =>
      val p = dp.getOrElse(w, 0.0); val q = dq.getOrElse(w, 0.0)
      val m = (p + q) / 2
      (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
        (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
    }.sum
    assert(math.abs(got - naive) < 1e-6, s"op $got vs naive $naive")
  }

  test("mixTemperature: weights normalize; sqrt-temperature boosts rare langs") {
    val m = TextAnalysis.mixTemperature(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(math.abs(m.map(_._3).sum - 1.0) < 1e-4)
    // temperature flattening: rarer languages get boost above their
    // natural share, the most common language gets damped
    val byN = m.sortBy(_._2)
    assert(byN.head._4 >= byN.last._4)
    // boost ordering is monotone decreasing in corpus share
    assert(byN.map(_._4).reverse.sorted.sameElements(byN.map(_._4).reverse))
  }
}
