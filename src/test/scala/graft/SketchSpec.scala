package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.util.Tables

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll merge: union of per-shard sketches equals the one-shot sketch") {
    val rows = Analytics.sketchMerge(spark, sf)
      .select("event_type", "users_direct", "users_merged")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, direct, merged) =>
      assert(direct === merged,
        s"$et: sketch merge is not lossless ($direct vs $merged)")
    }
  }

  test("hll estimates land within the sketch's error envelope of exact counts") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val est = Analytics.sketchMerge(spark, sf)
      .select("event_type", "users_direct").as[(String, Long)].collect()
    est.foreach { case (et, e) =>
      val x = exact(et).toDouble
      // default lgConfigK=12 gives ~1.6% RSE; 5% is > 3 sigma
      assert(math.abs(e - x) / x <= 0.05, s"$et: est $e vs exact $x")
    }
  }

  test("approx percentiles land within a rank bracket of the exact ones") {
    // approx_percentile returns an ELEMENT at ~the requested rank (rank
    // error, no interpolation) — so assert rank brackets, not value
    // distance: the sparse tail makes adjacent order stats far apart.
    val approx = Analytics.sketchMerge(spark, sf)
      .select("event_type", "p50_value", "p99_value")
      .as[(String, Double, Double)].collect()
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.95)").as("lo99"),
        max(col("value")).as("hi99"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map { case (et, a, b, c, d) => et -> ((a, b, c, d)) }.toMap
    approx.foreach { case (et, a50, a99) =>
      val (lo50, hi50, lo99, hi99) = exact(et)
      assert(a50 >= lo50 && a50 <= hi50, s"$et p50 $a50 outside [$lo50,$hi50]")
      assert(a99 >= lo99 && a99 <= hi99, s"$et p99 $a99 outside [$lo99,$hi99]")
    }
  }
}
