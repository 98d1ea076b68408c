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

  test("scrub excises exactly the tokens covered by shared runs >= 8") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("t"))
      .as[(Long, Seq[String])].collect()
    val bench = docs.filter(_._1 < 100L).map(_._2)
    val train = docs.filter(_._1 >= 100L).toMap
    val scrub = Dedup.decontamScrub(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    assert(scrub.map(_._1).toSet === train.keySet)
    // brute-force covered set: positions of `a` inside any maximal
    // common diagonal run of length >= 8 with any benchmark doc
    def covered(a: Seq[String]): Set[Int] = {
      val out = scala.collection.mutable.Set[Int]()
      bench.foreach { b =>
        val len = Array.ofDim[Int](a.length + 1, b.length + 1)
        for (i <- 1 to a.length; j <- 1 to b.length)
          if (a(i - 1) == b(j - 1)) len(i)(j) = len(i - 1)(j - 1) + 1
        for (i <- 1 to a.length; j <- 1 to b.length) {
          // end of a maximal run: next diagonal cell does not extend it
          val ends = i == a.length || j == b.length || a(i) != b(j)
          if (ends && len(i)(j) >= 8)
            out ++= (i - len(i)(j) + 1) to i // 1-based positions of a
        }
      }
      out.toSet
    }
    val sample = scrub.filter(_._1 % 5 == 0).take(60)
    sample.foreach { case (id, nTok, nRem, clean) =>
      val t = train(id)
      val cov = covered(t)
      assert(nTok === t.length.toLong, s"doc $id token count")
      assert(nRem === cov.size.toLong, s"doc $id removed count")
      val want = t.zipWithIndex.collect {
        case (tok, i) if !cov.contains(i + 1) => tok
      }.mkString(" ")
      assert(clean === want, s"doc $id rebuilt text")
    }
    assert(sample.exists(_._3 > 0), "sample must include contaminated docs")
    assert(sample.exists(_._3 == 0), "sample must include clean docs")
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
