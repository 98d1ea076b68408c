package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Monitor, TextAnalysis}
import graft.util.Tables

class MonitorSpec extends SparkSpec {
  import spark.implicits._

  test("cusum: window identity equals the classic sequential recursion") {
    val got = Monitor.cusum(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("peak_up_cents"), r.getAs[Long]("peak_up_rn"),
         r.getAs[Long]("peak_down_cents"), r.getAs[Long]("peak_down_rn"))).toMap
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        round($"value" * 100).cast("long").as("x"))
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (u, evs) =>
      val x = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val n = x.length.toLong
      val tot = x.sum
      val k = 5L * n
      // classic recursions: S_t = max(0, S_{t-1} + (n*x_t - tot -/+ k))
      var sp, sn = 0L
      var pkUp, pkDn = 0L
      var rnUp, rnDn = 1L
      x.zipWithIndex.foreach { case (xi, i) =>
        sp = math.max(0L, sp + (n * xi - tot - k))
        sn = math.max(0L, sn + (tot - n * xi - k))
        if (sp > pkUp) { pkUp = sp; rnUp = i + 1 }
        if (sn > pkDn) { pkDn = sn; rnDn = i + 1 }
      }
      val expect = (math.round(pkUp.toDouble / n), rnUp,
        math.round(pkDn.toDouble / n), rnDn)
      assert(got(u) == expect, s"cusum diverges for user $u: ${got(u)} vs $expect")
    }
  }

  test("ksDrift matches a driver-side exact recomputation") {
    val got = Monitor.ksDrift(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val rows = graft.util.Tables.events(spark, sf)
      .select($"event_type",
        ($"ts" < lit("2024-01-15 00:00:00").cast("timestamp")).as("ref"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Boolean, Long)].collect()
    for ((et, nRef, nCur, ks) <- got) {
      val s = rows.filter(_._1 == et)
      val ref = s.filter(_._2).map(_._3).sorted
      val cur = s.filterNot(_._2).map(_._3).sorted
      assert(ref.length.toLong === nRef && cur.length.toLong === nCur)
      val support = (ref ++ cur).distinct.sorted
      val d = support.map { v =>
        math.abs(ref.count(_ <= v).toDouble / ref.length -
          cur.count(_ <= v).toDouble / cur.length)
      }.max
      assert(math.abs(ks - d) < 1e-5, s"$et: $ks vs $d")
    }
  }

  test("ksDrift is 0 for identical halves and ~1 for disjoint supports") {
    // identical: split so both halves see every value equally — not
    // constructible from the fixture; instead assert the bounds contract
    val got = Monitor.ksDrift(spark, sf).as[(String, Long, Long, Double)].collect()
    assert(got.forall { case (_, _, _, ks) => ks >= 0.0 && ks <= 1.0 })
  }

  test("psi matches a driver-side recomputation with frozen reference bins") {
    val got = Monitor.psi(spark, sf).as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val rows = graft.util.Tables.events(spark, sf)
      .select($"event_type",
        ($"ts" < lit("2024-01-15 00:00:00").cast("timestamp")).as("ref"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Boolean, Long)].collect()
    for ((et, nRef, nCur, psi) <- got) {
      val s = rows.filter(_._1 == et)
      val ref = s.filter(_._2).map(_._3)
      val cur = s.filterNot(_._2).map(_._3)
      assert(ref.length.toLong === nRef && cur.length.toLong === nCur)
      val (lo, hi) = (ref.min, ref.max)
      def bin(c: Long): Long = math.min(9L, (math.min(hi, math.max(lo, c)) - lo) * 10 / (hi - lo + 1))
      val e = (0L until 10L).map { b =>
        val pr = (ref.count(bin(_) == b) + 1).toDouble / (ref.length + 10)
        val pc = (cur.count(bin(_) == b) + 1).toDouble / (cur.length + 10)
        (pc - pr) * math.log(pc / pr)
      }.sum
      assert(math.abs(psi - e) < 1e-5, s"$et: $psi vs $e")
      assert(psi >= 0.0) // PSI is a non-negative divergence
    }
  }

  test("negativeSample: deterministic, excludes self-pairs and true edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L))
      .toDF("a", "b")
    val s1 = Graph.negativeSample(edges, k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val s2 = Graph.negativeSample(edges, k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(s1 === s2) // replayable
    val edgeSet = Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L))
    assert(s1.nonEmpty)
    assert(s1.forall { case (a, _, b) =>
      a != b &&
        !edgeSet.contains((math.min(a, b), math.max(a, b))) })
    assert(s1.forall { case (_, i, _) => i >= 1 && i <= 4 })
    // a different seed draws a different probe set
    val s3 = Graph.negativeSample(edges, k = 4, seed = "neg2")
      .as[(Long, Long, Long)].collect().toSeq
    assert(s3 !== s1)
  }

  test("featureCross: buckets partition all rows; census bounded by bucket count") {
    val out = graft.queries.Analytics.featureCross(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val total = graft.util.Tables.events(spark, sf).count()
    assert(out.map(_._2).sum === total)
    assert(out.forall { case (b, n, nc, _) => b >= 0 && b < 64 && nc >= 1 && n >= nc })
  }

  test("tokenEntropy: repeated token → 0; all-distinct → log2(n), norm 1") {
    val docs = Seq(
      (1L, "x x x x"),
      (2L, "a b c d"),
      (3L, "a a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropyFromDocs(docs)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._4 === 0.0 && out(1L)._5 === 0.0)
    assert(math.abs(out(2L)._4 - 2.0) < 1e-6 && math.abs(out(2L)._5 - 1.0) < 1e-6)
    assert(math.abs(out(3L)._4 - 1.0) < 1e-6) // two equiprobable symbols
  }

  test("forecastAnomalies: rate matches its counts; robust threshold sane") {
    val rows = Monitor.forecastAnomalies(spark, sf)
      .as[(String, Long, Double, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, _, mad, nAnom, rate) =>
      assert(n > 0 && mad > 0.0, s"$et: degenerate residual spread")
      assert(nAnom >= 0 && nAnom <= n)
      assert(math.abs(rate - nAnom.toDouble / n) < 1e-6)
      // a median/MAD rule flags a MINORITY by construction: |r-med| >
      // 3*MAD can cover at most half the mass (MAD is the median of
      // |r-med|), and far less on anything unimodal
      assert(rate < 0.5, s"$et: threshold flags a majority — rule broken")
    }
  }

  test("mutualInfo: matches a brute-force contingency recount") {
    val Array((nCells, nEvents, mi, chi2)) = Monitor.mutualInfo(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(nEvents === Tables.events(spark, sf).count())
    assert(mi >= -1e-6 && chi2 >= 0.0) // MI >= 0 up to quantization
    val cells = Tables.events(spark, sf)
      .select($"event_type", floor($"value" / 10).cast("long").as("b"))
      .groupBy("event_type", "b").count()
      .as[(String, Long, Long)].collect()
    assert(nCells === cells.length)
    val n = cells.map(_._3).sum.toDouble
    val nx = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ny = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val bruteMi = cells.map { case (x, y, c) =>
      c / n * math.log(c * n / (nx(x).toDouble * ny(y)))
    }.sum
    val bruteChi = cells.map { case (x, y, c) =>
      val e = nx(x).toDouble * ny(y) / n
      (c - e) * (c - e) / e
    }.sum
    assert(math.abs(mi - bruteMi) < 1e-5, s"mi=$mi brute=$bruteMi")
    assert(math.abs(chi2 - bruteChi) < 1e-3, s"chi2=$chi2 brute=$bruteChi")
  }
}
