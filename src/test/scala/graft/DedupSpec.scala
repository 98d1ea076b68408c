package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different content with zero overlap here"),
    (4L, "another unrelated document about spark engines")
  ).toDF("doc_id", "text")

  test("shingles: word 3-grams, distinct, short docs yield none") {
    val sh = Dedup.shingles(Seq((9L, "a b")).toDF("doc_id", "text"))
    assert(sh.count() === 0)
    val sh0 = Dedup.shingles(docs.filter($"doc_id" === 0)).as[(Long, String)].collect()
    assert(sh0.length === 7) // 9 tokens -> 7 shingles
    assert(sh0.map(_._2).contains("the quick brown"))
  }

  test("exact groups collapse identical texts") {
    val out = docs.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
    val dup = out.filter($"n_docs" === 2).select("keep_id").as[Long].collect()
    assert(dup.toSeq === Seq(0L))
  }

  test("jaccard finds the engineered near-dup pair and LSH proposes it") {
    val sh = Dedup.shingles(docs)
    val card = sh.groupBy($"doc_id").agg(count(lit(1)).as("c"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).as("ix"))
    val jac = inter.join(card.as("ca"), $"id_a" === $"ca.doc_id")
      .join(card.as("cb"), $"id_b" === $"cb.doc_id")
      .withColumn("jac", $"ix".cast("double") / ($"ca.c" + $"cb.c" - $"ix"))
      .filter($"jac" >= 0.5 && $"jac" < 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(jac.contains((0L, 1L)))
    // LSH candidates must contain every exact + strong near-dup pair
    val cand = Dedup.minhashSignatures(docs)
    assert(cand.count() === 5)
    val exactPair = Dedup.minhashSignatures(docs)
      .select("doc_id", "h0").as[(Long, String)].collect().toMap
    assert(exactPair(0L) === exactPair(2L)) // identical docs, identical sig
  }

  test("simhash: identical docs collide, disjoint docs differ") {
    val fp = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(fp(0L) === fp(2L))
    assert(fp(0L).length === 16)
    assert(fp(0L).forall(c => c == '0' || c == '1'))
    assert(fp(0L) !== fp(3L))
  }

  test("keepLatest keeps exactly one row per key, newest first") {
    val df = Seq(("k1", 1L, "old"), ("k1", 2L, "new"), ("k2", 5L, "only"))
      .toDF("k", "v", "tag")
    val out = Dedup.keepLatest(df, Seq("k"), Seq($"v".desc))
      .select("k", "tag").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "new", "k2" -> "only"))
  }
}
