package graft

import graft.ops.TextAnalysis

/** BPE tokenizer induction + exact duplicated-span detection, on the
  * classic hand-traceable fixtures. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. (2016) worked example vocabulary (sans </w>)
  private def sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("w", "wc")

  test("bpe pair stats: weighted in-word pair frequencies, ranked") {
    val top = TextAnalysis.bpePairStatsFromWords(sennrich, topN = 3)
      .as[(String, Long)].collect().toSeq
    // es: newest 6 + widest 3 = 9; st: 9; we: lower 2 + newest 6 = 8
    // ties (es, st at 9) break lexically
    assert(top === Seq(("es", 9L), ("st", 9L), ("we", 8L)))
  }

  test("bpe learn: first three merges match the hand-run algorithm") {
    val merges = TextAnalysis.bpeLearnFromWords(spark, sennrich, merges = 3)
      .as[(Int, String, Long)].collect().toSeq
    // round 0: "e s" (9, ties "s t" lexically); round 1: the merged "es"
    // now pairs with t — "es t" (9); round 2: "l o" (7, ties "o w")
    assert(merges === Seq(
      (0, "e s", 9L), (1, "es t", 9L), (2, "l o", 7L)))
  }

  test("bpe learn: terminates early when no pairs remain") {
    val words = Seq(("ab", 4L)).toDF("w", "wc")
    val merges = TextAnalysis.bpeLearnFromWords(spark, words, merges = 5)
      .as[(Int, String, Long)].collect().toSeq
    // one merge collapses the only word to a single symbol; the loop
    // must stop rather than error on the empty pair table
    assert(merges === Seq((0, "a b", 4L)))
  }

  test("duplicated spans: cross-doc grams counted, within-doc repeats not") {
    val docs = Seq(
      (1L, "a b c d e"),        // shares "b c d" with doc 2
      (2L, "x b c d y"),
      (3L, "z z"),              // too short for any 3-gram
      (4L, "p q r p q r p q")   // repeats only within itself
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedSpansFromDocs(docs, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 3L, 1L, 0.333333),
      (3L, 0L, 0L, 0.0),
      (4L, 6L, 0L, 0.0)))
  }
}
