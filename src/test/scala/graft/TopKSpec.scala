package graft

import org.apache.spark.sql.functions._

import graft.plans.Graft
import graft.queries.Analytics
import graft.util.Tables

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("native top-k equals the row_number window form exactly") {
    val native = Analytics.topkNative(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val window = Analytics.topkPerGroup(spark, sf)
      .select($"user_id", $"event_id", $"value")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(native === window)
  }

  test("plan: partial heap before ONE exchange, final heap after, no sort") {
    val df = Graft.topKPerKey(
      Tables.events(spark, sf).select($"user_id", $"event_id", $"value"),
      Seq("user_id"), Seq(("value", true), ("event_id", false)), 3)
    df.collect() // finalize AQE
    // AQE hides the map-side stage from collect(); the final-plan text
    // shows both heap passes (partial inside the shuffle stage, final
    // above the AQE-coalesced read)
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(s.split("TopKPerKey").length - 1 === 2, s)
    assert(s.split("Exchange hashpartitioning").length - 1 === 1, s)
    assert(!s.contains("Sort "), s"custom top-k must not sort:\n$s")
  }

  test("k >= group size keeps every row; k bounds each group otherwise") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (2L, 3L, 1.0))
      .toDF("user_id", "event_id", "value")
    val all = Graft.topKPerKey(df, Seq("user_id"),
      Seq(("value", true), ("event_id", false)), 10)
    assert(all.count() === 3)
    val one = Graft.topKPerKey(df, Seq("user_id"),
      Seq(("value", true), ("event_id", false)), 1)
      .select("event_id").as[Long].collect().toSet
    assert(one === Set(1L, 3L)) // best per key
  }
}
