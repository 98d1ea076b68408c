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
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(r.forall { case (_, w, s, y, fl, fk) =>
      w > 0 && s > 0 && y > 0 &&
        math.abs(fl - (206.835 - 1.015 * w / s - 84.6 * y / w)) < 1e-3 &&
        math.abs(fk - (0.39 * w / s + 11.8 * y / w - 15.59)) < 1e-3 })
    // spot-check the syllable heuristic: vowel runs, not vowel chars
    val doc = graft.util.Tables.documents(spark, sf)
      .orderBy($"doc_id").select($"text").as[String].head()
    val sylls = "[aeiouy]+".r.findAllIn(doc).size.max(1)
    assert(r.minBy(_._1)._4 === sylls)
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
