package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.util.Tables

/** The sketch assertions live IN the gated query outputs since round 5
  * (bracket-style oracles): these tests assert every envelope flag is
  * green and cross-check the flag logic against independently computed
  * exact values, so a flag that silently went vacuous would be caught. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch merge: every bracket flag is green at sf") {
    val rows = Analytics.sketchMerge(spark, sf)
      .select("event_type", "merge_lossless", "users_within_rse",
        "p50_in_bracket", "p99_in_bracket")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, ml, rse, p50, p99) =>
      assert(ml === 1L, s"$et: per-shard HLL merge is not lossless")
      assert(rse === 1L, s"$et: HLL estimate outside 5% of exact")
      assert(p50 === 1L, s"$et: approx p50 outside the [.45,.55] rank bracket")
      assert(p99 === 1L, s"$et: approx p99 outside the [.95,max] rank bracket")
    }
  }

  test("quantile sketch: certificates green, brute-force quantile inside bounds") {
    val rows = Analytics.quantileSketch(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
    // independent brute force: collect cents per key, rank directly
    val vals = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100).cast("long").as("c"))
      .filter($"c" >= 1).as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    rows.foreach { case (et, q, n, bucket, lo, hi, exact, ok) =>
      assert(ok === 1L, s"$et q$q: exact $exact outside [$lo, $hi]")
      val sorted = vals(et)
      assert(n === sorted.length.toLong, s"$et: n mismatch")
      val target = ((n * q + 99) / 100).toInt
      assert(exact === sorted(target - 1), s"$et q$q: exact quantile wrong")
      assert(lo <= exact && exact <= hi)
      // relative-error envelope of the log-bucket: width <= lo/sub + 2
      assert(hi - lo <= lo / 8 + 2, s"$et q$q: bucket [$lo,$hi] too wide")
      assert(bucket >= 0)
    }
  }

  test("approx distinct: flags green, exact columns match an independent recount") {
    val rows = Analytics.approxDistinct(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"), countDistinct("value").as("v"))
      .as[(String, Long, Long)].collect()
      .map { case (et, u, v) => et -> ((u, v)) }.toMap
    rows.foreach { case (et, eu, ev, uok, vok) =>
      assert((eu, ev) === exact(et), s"$et: exact columns drifted")
      assert(uok === 1L, s"$et: default-rsd sketch outside 15%")
      assert(vok === 1L, s"$et: rsd=0.02 sketch outside 6%")
    }
  }

  test("count-min: est >= exact for every probe, exact counts verified") {
    val rows = graft.ops.TextAnalysis.countMin(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 20)
    rows.foreach { case (term, exact, est, over) =>
      assert(est >= exact, s"'$term': CM underestimated ($est < $exact)")
      assert(over === est - exact, s"'$term': overcount column inconsistent")
    }
    // the probed exact counts must match an independent bigram recount
    val docs = Tables.documents(spark, sf)
    val recount = docs.select(explode(zip_with(
        slice(split(col("text"), " "), lit(1), size(split(col("text"), " ")) - 1),
        slice(split(col("text"), " "), lit(2), size(split(col("text"), " ")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    rows.foreach { case (term, exact, _, _) =>
      assert(recount(term) === exact, s"'$term': probe exact count drifted")
    }
  }

  test("kmv overlap: estimates track exact within sketch error; pairs complete") {
    val rows = graft.ops.TextAnalysis.kmvOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    val sources = rows.flatMap(r => Seq(r._1, r._2)).distinct
    assert(rows.length === sources.length * (sources.length - 1) / 2,
      "every unordered source pair exactly once")
    rows.foreach {
      case (a, b, na, nb, exInter, exUnion, kmvU, kmvI, relErr) =>
        assert(a < b)
        assert(exInter <= math.min(na, nb) && exUnion >= math.max(na, nb))
        assert(exUnion === na + nb - exInter)
        assert(kmvI <= kmvU + 1e-9, s"($a,$b): inter est above union est")
        // KMV with k=256 has relative std-err ~1/sqrt(254) ≈ 6.3%; a 4-σ
        // band on the fixed corpus stays far from flaking
        assert(relErr < 0.25, s"($a,$b): union rel err $relErr")
        assert(math.abs(kmvI - exInter) <=
          0.25 * math.max(exUnion.toDouble, 1.0) + 1e-9,
          s"($a,$b): inter est $kmvI vs exact $exInter")
        assert(math.abs(relErr -
          math.abs(kmvU - exUnion) / exUnion) < 2e-6)
    }
  }
}
