package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.util.Tables

/** Round-4 analytics operators: skyline (Pareto frontier), per-group
  * mode, median absolute deviation, weekly cohort retention. Each is
  * cross-checked against an independent brute-force computation on the
  * sf0.001 tables — the same ground truth the DuckDB oracle encodes,
  * derived a second way. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: matches the quadratic dominance definition exactly") {
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Long)].collect()
    val brute = parts.filter { case (_, pp, ps) =>
      !parts.exists { case (_, qp, qs) =>
        qp <= pp && qs <= ps && (qp < pp || qs < ps)
      }
    }.map(_._1).toSet
    val sky = Analytics.skyline(spark, sf)
      .select("p_partkey").as[Long].collect().toSet
    assert(sky === brute)
    assert(sky.nonEmpty)
  }

  test("skyline survivors are mutually non-dominating") {
    val sky = Analytics.skyline(spark, sf)
      .as[(Long, Double, Long)].collect()
    for ((_, pp, ps) <- sky; (_, qp, qs) <- sky)
      assert(!(qp <= pp && qs <= ps && (qp < pp || qs < ps)))
  }

  test("mode: per-user argmax with count-desc, lexicographic tie-break") {
    val counts = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type").count()
      .as[(Long, String, Long)].collect()
    val brute = counts.groupBy(_._1).map { case (u, rows) =>
      val best = rows.minBy { case (_, et, n) => (-n, et) }
      u -> (best._2, best._3)
    }
    val got = Analytics.modePerUser(spark, sf)
      .as[(Long, String, Long)].collect()
      .map { case (u, et, n) => u -> (et, n) }.toMap
    assert(got === brute)
  }

  test("mad: hand-computed on one event_type") {
    val got = Analytics.madPerType(spark, sf)
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    def interpMedian(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    got.foreach { case (et, medianValue, mad) =>
      val vals = Tables.events(spark, sf).filter($"event_type" === et)
        .select($"value").as[Double].collect()
      val med = interpMedian(vals)
      assert(math.abs(medianValue - med) < 1e-6, s"median $et")
      val madBrute = interpMedian(vals.map(v => math.abs(v - med)))
      assert(math.abs(mad - madBrute) < 1e-6, s"mad $et")
      // MAD is robust: never negative, bounded by the value range
      assert(mad >= 0.0 && mad <= vals.max - vals.min)
    }
  }

  test("cohort retention: offset-0 cell covers every user of the cohort") {
    val ret = Analytics.cohortRetention(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect()
    assert(ret.nonEmpty)
    assert(ret.forall(_._2 >= 0L)) // no event precedes its user's first
    val cohortSizes = Tables.events(spark, sf)
      .groupBy($"user_id").agg(min($"ts").as("f"))
      .withColumn("w", date_trunc("week", $"f").cast("date"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    // the first-week cell is exactly the cohort's size (every user is
    // active in the week of their own first event by definition)
    val zeroCells = ret.filter(_._2 == 0L)
      .map { case (w, _, n) => w -> n }.toMap
    assert(zeroCells === cohortSizes)
    // retention never exceeds cohort size at any offset
    ret.foreach { case (w, _, n) => assert(n <= cohortSizes(w)) }
  }

  test("rfm: cells partition purchasers; quintiles are balanced; monetary conserved") {
    val cells = Analytics.rfm(spark, sf)
      .as[(Int, Int, Int, Long, Long, Long)].collect()
    val raw = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("f"), sum(round($"value" * 100).cast("long")).as("m"))
      .as[(Long, Long, Long)].collect()
    assert(cells.map(_._4).sum === raw.length, "cells partition purchasers")
    assert(cells.map(_._5).sum === raw.map(_._3).sum, "monetary conserved")
    cells.foreach { case (r, f, m, users, _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      assert(users > 0)
    }
    // each score axis is a balanced quintile of the purchaser set: the
    // ntile contract says bucket sizes differ by at most one
    Seq(cells.groupBy(_._1), cells.groupBy(_._2), cells.groupBy(_._3))
      .foreach { ax =>
        val sizes = ax.view.mapValues(_.map(_._4).sum).values.toSeq
        assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles: $sizes")
      }
    // high m_score cells cannot average below low m_score cells
    val mAvg = cells.groupBy(_._3).view.mapValues { g =>
      g.map(_._5).sum.toDouble / g.map(_._4).sum
    }.toMap
    (1 to 4).foreach(i =>
      if (mAvg.contains(i) && mAvg.contains(i + 1))
        assert(mAvg(i) <= mAvg(i + 1) + 1e-9, s"m quintile $i order"))
  }
}
