package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.Analytics
import graft.util.Tables

/** Round-4 feature-prep operators: z-score scaling, modified-z robust
  * outliers, temporal split, label encoding, VWAP, sorted-neighborhood
  * dedup. Brute-force cross-checks on the sf0.001 tables. */
class FeaturePrepSpec extends SparkSpec {
  import spark.implicits._

  test("featureScale: z-scores standardize each event_type (mean 0, sd 1)") {
    val z = Analytics.featureScale(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(z.nonEmpty)
    z.groupBy(_._2).foreach { case (_, g) =>
      val zs = g.map(_._3)
      val m = zs.sum / zs.length
      val sd = math.sqrt(zs.map(v => (v - m) * (v - m)).sum / (zs.length - 1))
      assert(math.abs(m) < 1e-4)          // rounding noise only
      assert(math.abs(sd - 1.0) < 1e-3)
    }
    // spot-check one row against a direct computation
    val raw = Tables.events(spark, sf)
      .select($"event_id", $"event_type",
        expr("cast(round(value * 100) as bigint)"))
      .as[(Long, String, Long)].collect()
    val g = raw.filter(_._2 == raw.head._2)
    val n = g.length.toDouble
    val s = g.map(_._3).sum.toDouble
    val ss = g.map(r => r._3 * r._3).sum.toDouble
    val sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))
    val expected = (raw.head._3.toDouble - s / n) / sd
    val got = z.find(_._1 == raw.head._1).get._3
    assert(math.abs(got - expected) < 1e-6)
  }

  test("robustOutliers: flags exactly the rows whose modified z exceeds the fence") {
    val flagged = Analytics.robustOutliers(spark, sf)
      .as[(Long, String, Double, Double)].collect()
    assert(flagged.forall(_._4 > 3.5))
    // recompute one event_type's fence membership by hand
    val vals = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val et = vals.head._2
    def interpMedian(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val g = vals.filter(_._2 == et)
    val med = interpMedian(g.map(_._3))
    val mad = interpMedian(g.map(r => math.abs(r._3 - med)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = g.filter(r => r6(math.abs(0.6745 * (r._3 - med) / mad)) > 3.5)
      .map(_._1).toSet
    assert(flagged.filter(_._2 == et).map(_._1).toSet === expect)
  }

  test("temporalSplit: leakage-free — every train event precedes every test event per user") {
    val split = Analytics.temporalSplit(spark, sf)
      .as[(Long, Long, String)].collect()
    val times = Tables.events(spark, sf)
      .select($"event_id", expr("unix_micros(ts)"))
      .as[(Long, Long)].collect().toMap
    split.groupBy(_._1).foreach { case (_, g) =>
      val (train, test) = g.partition(_._3 == "train")
      assert(train.nonEmpty)
      if (test.nonEmpty) {
        assert(train.map(r => times(r._2)).max <= test.map(r => times(r._2)).min)
        // 80/20 by percent_rank: train count = ceil(0.8*(n-1)) boundary rule
        val n = g.length
        val expectTrain = (0 until n).count(r => r.toDouble / (n - 1) < 0.8)
        assert(train.length === expectTrain)
      }
    }
  }

  test("targetEncode: oof excludes the fold's own rows; smoothed shrinks to the prior") {
    val rows = graft.ops.Prep.targetEncode(spark, sf)
      .as[(String, String, Long, Long, Long, Option[Double], Double)].collect()
    assert(rows.nonEmpty)
    def r6(x: Double) = math.round(x * 1e6).toDouble / 1e6
    val byFeat = rows.groupBy(_._1)
    assert(byFeat.keySet === Set("priority", "month"))
    byFeat.foreach { case (_, g) =>
      val gn = g.map(_._4).sum
      val gsy = g.map(_._5).sum
      val prior = gsy.toDouble / gn
      g.groupBy(_._2).foreach { case (_, lv) =>
        val n = lv.map(_._4).sum
        val sy = lv.map(_._5).sum
        lv.foreach { case (_, _, _, nf, syf, oof, smoothed) =>
          // leakage-free: the fold's own rows never enter its encode
          if (n == nf) assert(oof.isEmpty)
          else assert(oof.contains(r6((sy - syf).toDouble / (n - nf))))
          // m-estimate sits between the level mean and the global prior
          assert(smoothed === r6((sy + 20.0 * prior) / (n + 20.0)))
          val lo = math.min(sy.toDouble / n, prior) - 1e-9
          val hi = math.max(sy.toDouble / n, prior) + 1e-9
          assert(smoothed >= lo - 5e-7 && smoothed <= hi + 5e-7)
        }
      }
    }
  }

  test("labelEncode: dense frequency-ordered codes") {
    val enc = Analytics.labelEncode(spark, sf)
      .as[(Long, String, Int)].collect()
    val codeOf = enc.map(r => r._2 -> r._3).distinct.toMap
    assert(codeOf.values.toSeq.sorted === (0 until codeOf.size))
    val freq = enc.groupBy(_._2).view.mapValues(_.length).toMap
    // codes ordered by (freq desc, name)
    val expected = freq.toSeq.sortBy { case (et, n) => (-n, et) }
      .zipWithIndex.map { case ((et, _), i) => et -> i }.toMap
    assert(codeOf === expected)
  }

  test("vwap: hand-recomputed for one brand") {
    val got = Analytics.vwap(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_extendedprice", $"l_quantity")
      .as[(String, Double, Double)].collect()
    val brand = got.head._1
    val g = li.filter(_._1 == brand)
    val cents = g.map(r => math.round(r._2 * 100)).sum
    val milli = g.map(r => math.round(r._3 * 1000)).sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._2 === g.length.toLong)
    assert(got.head._3 === r6(cents.toDouble / milli.toDouble * 1000.0 / 100.0))
  }

  test("corrMatrix: bounded, complete over type pairs, exact on a hand pair") {
    val rs = Analytics.corrMatrix(spark, sf)
      .as[(String, String, Long, Double)].collect()
    val types = Tables.events(spark, sf).select($"event_type").distinct()
      .as[String].collect().sorted
    assert(rs.length === types.length * (types.length - 1) / 2)
    rs.foreach { case (ta, tb, n, r) =>
      assert(ta < tb); assert(n > 1)
      assert(r >= -1.0 && r <= 1.0)
    }
    // hand-recompute one pair from the hourly integer sums
    val hourly = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 3600000000"), $"event_type",
        expr("cast(round(value * 100) as bigint)"))
      .as[(Long, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val (ta, tb, _, rGot) = rs.head
    val joined = hourly.collect { case ((h, t), x) if t == ta =>
      hourly.get((h, tb)).map(y => (x, y)) }.flatten.toSeq
    val n = joined.length.toLong
    val (sx, sy) = (joined.map(_._1).sum, joined.map(_._2).sum)
    val sxx = joined.map(p => p._1 * p._1).sum
    val syy = joined.map(p => p._2 * p._2).sum
    val sxy = joined.map(p => p._1 * p._2).sum
    val expect = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rGot === r6(expect))
  }

  test("sortedNeighborhood: pairs verified at tau, candidates within the block window") {
    val pairs = Dedup.sortedNeighborhood(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"lang", substring($"text", 1, 24), split($"text", " "))
      .as[(Long, String, String, Seq[String])].collect()
    val byId = docs.map(d => d._1 -> d).toMap
    // neighborhood rank within (lang) block sorted by (prefix, id)
    val rank = docs.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      g.sortBy(d => (d._3, d._1)).zipWithIndex.map { case (d, i) => d._1 -> i }.toSeq
    }.toMap
    val blockOf = docs.map(d => d._1 -> d._2).toMap
    pairs.foreach { case (a, b, jac) =>
      assert(blockOf(a) === blockOf(b))
      assert(math.abs(rank(a) - rank(b)) <= 3)
      val (ta, tb) = (byId(a)._4.distinct.toSet, byId(b)._4.distinct.toSet)
      val expect = (ta & tb).size.toDouble / (ta | tb).size.toDouble
      assert(jac >= 0.5)
      assert(math.abs(jac - expect) < 1e-6)
    }
  }
}
