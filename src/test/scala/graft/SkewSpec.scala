package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.util.Tables

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches the unsalted plan exactly for decomposable aggregates") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"event_id").as("s"),
           min($"value").as("lo"), max($"value").as("hi"))
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    val salted = Skew.saltedAgg(ev, Seq("event_type"), buckets = 16, aggs = Map(
        "n" -> ("event_id", Skew.CountAgg),
        "s" -> ("event_id", Skew.SumAgg),
        "lo" -> ("value", Skew.MinAgg),
        "hi" -> ("value", Skew.MaxAgg)))
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
  }

  test("AQE splits a skewed join partition at runtime") {
    // one hot key carrying ~100k rows vs 9 cold keys: with thresholds
    // lowered to demo scale, OptimizeSkewedJoin must split the hot
    // partition (the executedPlan marks the SMJ 'skew=true'), and the
    // join result stays exact. This is the runtime half of skew
    // handling; Skew.saltedAgg is the static half.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = spark.range(200000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id" % 10).as("k"),
          $"id".as("v"))
      val right = (0L until 10L).map(k => (k, s"dim$k")).toDF("k", "name")
        .repartition(4) // non-broadcastable shape under the -1 threshold
      val joined = left.join(right, "k")
      // execute THIS dataset so its own AQE plan finalizes (count() would
      // plan a separate aggregate query and leave `joined` unexecuted)
      assert(joined.collect().length === 200000)
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("skew=true"), s"no skew split in:\n${p.take(2000)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("salting actually spreads a hot key over multiple partial groups") {
    val ev = Tables.events(spark, sf)
    val partials = ev.withColumn("__salt",
        pmod(hash(ev.columns.map(col).toSeq: _*), lit(16)))
      .groupBy($"event_type", $"__salt").count()
      .groupBy($"event_type").count()
      .as[(String, Long)].collect()
    partials.foreach { case (k, n) => assert(n > 1, s"key $k not spread") }
  }

  test("joinSizeEstimate: CM estimate is an upper bound; exact sizes verified") {
    val rows = graft.ops.Skew.joinSizeEstimate(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows.size === 2)
    rows.foreach { case (m, (exact, est, over)) =>
      assert(est >= exact, s"$m: CM inner product below the true size")
      assert(over === est - exact)
    }
    // exact join sizes against direct joins
    val oc = Tables.orders(spark, sf).join(Tables.customer(spark, sf),
      col("o_custkey") === col("c_custkey")).count()
    assert(rows("orders_x_customer_custkey")._1 === oc)
    val li = Tables.lineitem(spark, sf).select($"l_partkey")
    val f2 = li.join(li.withColumnRenamed("l_partkey", "p2"),
      col("l_partkey") === col("p2")).count()
    assert(rows("lineitem_selfjoin_partkey_f2")._1 === f2)
  }
}
