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

  test("distinctKeysHint above the cap plans the spillable window form, identical rows") {
    val base = Tables.events(spark, sf).select($"user_id", $"event_id", $"value")
    val cols = Seq(("value", true), ("event_id", false))
    val hinted = Graft.topKPerKey(base, Seq("user_id"), cols, 3,
      distinctKeysHint = Some(Long.MaxValue))
    val p = hinted.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey"), p)
    assert(p.contains("Window"), p)
    val native = Graft.topKPerKey(base, Seq("user_id"), cols, 3)
    assert(hinted.collect().toSet === native.collect().toSet)
  }

  private def eightKeys = (1 to 8).flatMap(k =>
    (1 to 5).map(i => (k.toLong, (k * 100 + i).toLong, (i * k).toDouble)))
    .toDF("user_id", "event_id", "value")

  test("map-side key cap: overflow keys stream through unpruned, result stays exact") {
    // 64 keys round-robin over 2 map tasks (~64 distinct keys per task,
    // past the cap → keys beyond it stream through unpruned); the final
    // pass hash-spreads 64 keys over the shuffle tasks, under the cap
    val df = (1 to 64).flatMap(k =>
      (1 to 5).map(i => (k.toLong, (k * 100 + i).toLong, (i * k).toDouble)))
      .toDF("user_id", "event_id", "value").repartition(2)
    // cap 40: each round-robin map task sees ~all 64 keys (overflow
    // fires), while the 4 final hash tasks hold ~16 keys each (under)
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysConf, "40")
    // AQE would coalesce this tiny shuffle into ONE final task (all 64
    // keys — past the cap, correctly fail-fast); keep the hash spread
    // so the test exercises the map-side overflow path in isolation
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val cols = Seq(("value", true), ("event_id", false))
      val got = Graft.topKPerKey(df, Seq("user_id"), cols, 2)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val want = Graft.windowTopK(df, Seq("user_id"), cols, 2)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq === want.toSeq)
      assert(got.length === 128) // 2 per key — overflow keys pruned by the final pass
    } finally {
      spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysConf)
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  test("final pass past the cap fails fast with guidance, not an OOM") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1") // all keys, one final task
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysConf, "3")
    try {
      val ex = intercept[Exception] {
        Graft.topKPerKey(eightKeys, Seq("user_id"),
          Seq(("value", true), ("event_id", false)), 2).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("maxKeysPerTask")), ex.toString)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysConf)
    }
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
