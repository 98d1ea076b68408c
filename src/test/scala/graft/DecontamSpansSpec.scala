package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Span-level decontamination must equal an independent quadratic
  * longest-common-token-substring replay (the O(|a|·|b|) DP the
  * distributed seed+LCP construction avoids), including the sub-seed
  * widths, and must not depend on input partitioning. */
class DecontamSpansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val got: Map[Long, (Long, Long)] =
    Dedup.decontamSpans(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("matches a brute-force longest-common-substring replay on a sample") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("t"))
      .as[(Long, Seq[String])].collect()
    val bench = docs.filter(_._1 < 100L).map(_._2)
    val train = docs.filter(_._1 >= 100L)
    assert(got.keySet === train.map(_._1).toSet)
    // classic DP: longest common substring of token sequences a, b
    def lcsub(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best.toLong
    }
    // a deterministic sample spanning contaminated and clean docs
    val sample = train.filter(_._1 % 7 == 0).take(40)
    sample.foreach { case (id, t) =>
      val expect = bench.map(b => lcsub(t, b)).max
      assert(got(id) === ((t.length.toLong, expect)),
        s"doc $id: engine ${got(id)} vs brute-force ($expect)")
    }
    assert(sample.nonEmpty)
  }

  test("spans are bounded by doc length and partitioning-invariant") {
    got.foreach { case (id, (n, span)) =>
      assert(span >= 0L && span <= n, s"doc $id span $span outside [0, $n]")
    }
    val reshuffled = Dedup.decontamSpans(spark, sf)
      .repartition(7).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(reshuffled === got)
  }
}
