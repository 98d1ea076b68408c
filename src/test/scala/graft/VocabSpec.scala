package graft

import graft.ops.TextAnalysis
import graft.queries.Analytics
import graft.util.Tables

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("vocab: tf sums per-doc counts, df counts docs, deterministic order") {
    val v = TextAnalysis.vocab(spark, sf, topN = 5)
      .as[(String, Long, Long)].collect()
    assert(v.length === 5)
    // sorted by tf desc then term asc
    assert(v.sliding(2).forall { case Array((t1, f1, _), (t2, f2, _)) =>
      f1 > f2 || (f1 == f2 && t1 < t2)
    })
    v.foreach { case (_, tf, df) => assert(tf >= df && df >= 1) }
  }

  test("tfidf: one top term per document, non-negative scores") {
    val top = TextAnalysis.topTfidf(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(top.length === 500) // one row per document at sf0.001
    assert(top.map(_._1).distinct.length === top.length)
    top.foreach { case (_, term, score) =>
      assert(term.nonEmpty && score >= 0.0)
    }
  }

  test("shard census: 16 deterministic shards covering every document") {
    val c = TextAnalysis.shardCensus(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(c.map(_._1).toSet.subsetOf((0 until 16).toSet))
    assert(c.map(_._2).sum === 500)
    // determinism: same input, same assignment
    val c2 = TextAnalysis.shardCensus(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(c.toSeq === c2.toSeq)
  }

  test("heavy hitters: sketch counts are exact while cardinality fits capacity") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.heavyHitters(spark, sf, k = 10)
      .as[(String, Long, Long)].collect()
    assert(got.length === 10)
    // the sketch-agreement flag (the bracket the oracle hashes) is green
    got.foreach { case (term, _, ok) => assert(ok === 1L, s"$term: sketch missed") }
    val exact = graft.util.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    // every reported count is the true count (vocab << sketch capacity)
    got.foreach { case (term, cnt, _) => assert(exact(term) === cnt, term) }
    // and the selection is a valid top-k under ties: every reported count
    // is >= the (k+1)-th largest true count
    val boundary = exact.values.toSeq.sorted(Ordering[Long].reverse)
      .drop(10).headOption.getOrElse(0L)
    got.foreach { case (_, cnt, _) => assert(cnt >= boundary) }
  }

  test("profile: one row per column, exact counts on lineitem") {
    val p = Analytics.profileTable(spark, sf)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(p.map(_._1).toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    val nRows = p.head._2
    p.foreach { case (_, n, nulls, dist, mn, mx, avg) =>
      assert(n === nRows)      // every column profiled over the same rows
      assert(nulls === 0L)
      assert(dist > 0 && dist <= n)
      assert(mn <= avg && avg <= mx)
    }
  }

  test("inverted index: postings reconstruct token totals, df counts postings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val idx = TextAnalysis.invertedIndex(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    // Σ n_occ over all postings = total tokens in the corpus
    val totalTokens = Tables.documents(spark, sf)
      .select(sum(TextAnalysis.tokenCount(col("text")))).as[Long].head()
    assert(idx.map(_._3).sum === totalTokens)
    // df is the posting-list length of its term, same value on every row
    idx.groupBy(_._1).foreach { case (_, posts) =>
      assert(posts.forall(_._5 == posts.length.toLong))
      assert(posts.map(_._2).distinct.length === posts.length) // one per doc
    }
    // first_pos is 1-based and within the doc
    assert(idx.forall(_._4 >= 1L))
  }
}
