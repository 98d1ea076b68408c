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

  test("salting actually spreads a hot key over multiple partial groups") {
    val ev = Tables.events(spark, sf)
    val partials = ev.withColumn("__salt",
        pmod(hash(ev.columns.map(col).toSeq: _*), lit(16)))
      .groupBy($"event_type", $"__salt").count()
      .groupBy($"event_type").count()
      .as[(String, Long)].collect()
    partials.foreach { case (k, n) => assert(n > 1, s"key $k not spread") }
  }
}
