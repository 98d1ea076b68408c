package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}
import graft.queries.Analytics
import graft.util.Tables

/** Round-4 continuation operators: hourly LOCF gap fill, exact-moment
  * OLS trend, sliding-window chunking, incremental dedup. Each is
  * cross-checked against an independent brute-force computation on the
  * sf0.001 tables. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("gapFill: grid is contiguous per user and LOCF carries the last observation") {
    val rows = Analytics.gapFill(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)

    // raw per-(user, hour) latest observation, computed independently
    val raw = Tables.events(spark, sf)
      .select($"user_id", expr("unix_micros(ts) div 3600000000").as("h"),
        $"ts", $"event_id", $"value")
      .as[(Long, Long, java.sql.Timestamp, Long, Double)].collect()
    val latest = raw.groupBy(r => (r._1, r._2)).view.mapValues { g =>
      val best = g.maxBy(r => (r._3.getTime, r._4))
      BigDecimal(best._5).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap

    byUser.foreach { case (u, g) =>
      val hours = g.map(_._2).sorted
      // contiguous: exactly first..last with no holes
      assert(hours === (hours.head to hours.last).toArray)
      // first row of each user is always observed (span starts at an event)
      assert(g.minBy(_._2)._4)
      var carried = Double.NaN
      g.sortBy(_._2).foreach { case (_, h, v, isObs) =>
        assert(isObs === latest.contains((u, h)))
        if (isObs) carried = latest((u, h))
        assert(v === carried) // LOCF: value equals last observed
      }
    }
  }

  test("interpolate: observed hours are exact, silent hours sit on the anchor line") {
    val rows = Analytics.interpolate(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.sortBy(_._2)
      // grid contiguous, endpoints observed (anchors exist everywhere)
      assert(s.head._4 && s.last._4)
      assert(s.map(_._2).toSeq === (s.head._2 to s.last._2).toSeq)
      // every silent hour lies on the segment between its anchors
      val obsIdx = s.zipWithIndex.filter(_._1._4).map(_._2)
      obsIdx.zip(obsIdx.tail).foreach { case (i, j) =>
        val (vi, vj) = (s(i)._3, s(j)._3)
        (i + 1 until j).foreach { k =>
          val frac = (k - i).toDouble / (j - i)
          val expect = vi + (vj - vi) * frac
          assert(math.abs(s(k)._3 - expect) < 1e-6,
            s"hour ${s(k)._2}: ${s(k)._3} vs $expect")
        }
      }
    }
  }

  test("ohlcMulti: the 1d frame equals the daily resample; coarser frames nest tick counts") {
    val multi = Analytics.ohlcMulti(spark, sf)
      .as[(Long, String, Long, Double, Double, Double, Double, Long)].collect()
    // 1d bars == ohlcResample daily bars (bucket = epoch day of the date)
    val daily = Analytics.ohlcResample(spark, sf)
      .as[(Long, java.sql.Date, Double, Double, Double, Double, Long)].collect()
      .map(r => (r._1, r._2.toLocalDate.toEpochDay) -> (r._3, r._4, r._5, r._6, r._7))
      .toMap
    val d1 = multi.filter(_._2 == "1d")
    assert(d1.length === daily.size)
    d1.foreach { case (u, _, b, o, h, l, c, n) =>
      assert(daily((u, b)) === ((o, h, l, c, n)))
    }
    // every frame partitions the same tick count
    val total = Tables.events(spark, sf).count()
    Seq("1h", "1d", "1w", "1M").foreach { tf =>
      assert(multi.filter(_._2 == tf).map(_._8).sum === total, tf)
    }
  }

  test("olsTrend: recovers slope/intercept of a clean synthetic line") {
    // y = 250 + 3x cents over x = 0..99: slope and intercept exact
    val n = 100L
    val sx = (0L until n).sum
    val sy = (0L until n).map(x => 250L + 3 * x).sum
    val sxx = (0L until n).map(x => x * x).sum
    val sxy = (0L until n).map(x => x * (250L + 3 * x)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(slope === 3.0)
    assert((sy.toDouble - slope * sx.toDouble) / n.toDouble === 250.0)

    // and on real data the moments match an independent aggregation
    val got = Analytics.olsTrend(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select($"event_type",
        expr("(unix_micros(ts) - 1704067200000000) div 3600000000").as("x"),
        expr("cast(round(value * 100) as bigint)").as("y"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (et, gn, gslope, gint) =>
      val g = raw.filter(_._1 == et)
      assert(gn === g.length.toLong)
      val (bn, bsx, bsy) = (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum)
      val bsxx = g.map(r => r._2 * r._2).sum
      val bsxy = g.map(r => r._2 * r._3).sum
      val bslope = (bn * bsxy - bsx * bsy).toDouble / (bn * bsxx - bsx * bsx).toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gslope === r6(bslope))
      assert(gint === r4((bsy.toDouble - bslope * bsx.toDouble) / bn.toDouble))
    }
  }

  test("chunkOverlap: full coverage, correct overlap, remainder tail") {
    val W = 64; val S = 48
    val chunks = TextAnalysis.chunkOverlap(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val nTokens = Tables(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.map(_._1).toSet === nTokens.keySet)
    chunks.groupBy(_._1).foreach { case (doc, g) =>
      val n = nTokens(doc)
      val byId = g.sortBy(_._2)
      // chunk ids are 0..k-1 dense
      assert(byId.map(_._2) === (0L until byId.length.toLong).toArray)
      // every chunk but the last is exactly W tokens; coverage is total:
      // last chunk ends at the last token
      byId.init.foreach(c => assert(c._3 === W.toLong))
      val last = byId.last
      assert(last._3 === n - S.toLong * (byId.length - 1) || last._3 === W.toLong)
      assert(S.toLong * (byId.length - 1) + last._3 === n)
      // expected chunk count
      val expected = if (n <= W) 1L else 1L + (n - W + S - 1) / S
      assert(byId.length.toLong === expected)
    }
  }

  test("incrementalDedup: admitted hashes are disjoint from history, one survivor per hash") {
    val admitted = Dedup.incrementalDedup(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(admitted.nonEmpty)
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", md5($"text")).as[(Long, String)].collect()
    val histHashes = docs.filter(_._1 % 10 < 8).map(_._2).toSet
    val delta = docs.filter(_._1 % 10 >= 8)
    // no admitted hash is in history; survivor is delta's min doc_id
    admitted.foreach { case (id, h, nDups) =>
      assert(!histHashes.contains(h))
      val dup = delta.filter(_._2 == h)
      assert(id === dup.map(_._1).min)
      assert(nDups === dup.length.toLong)
    }
    // completeness: every novel delta hash is admitted exactly once
    val novel = delta.filterNot(d => histHashes.contains(d._2)).map(_._2).toSet
    assert(admitted.map(_._2).toSet === novel)
    assert(admitted.map(_._2).distinct.length === admitted.length)
  }
}
