package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamJoin

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, min: Int, id: Long) =
    (u, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), id)

  test("stream-stream interval join emits in-band pairs across micro-batches only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    def named(s: MemoryStream[(Long, Timestamp, Long)]) =
      s.toDF().toDF("user_id", "ts", "event_id")
    val q = StreamJoin.clicksWithPurchases(named(clicks), named(purchases))
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      clicks.addData(ev(1, 10, 100), ev(2, 10, 101))
      purchases.addData(ev(1, 12, 200)) // in band (+2 min) for user 1
      q.processAllAvailable()
      // cross-batch: a purchase arriving later still joins a buffered click
      purchases.addData(ev(2, 14, 201)) // in band (+4 min) for user 2
      purchases.addData(ev(1, 40, 202)) // out of band (+30 min) — no match
      q.processAllAvailable()
      val rows = spark.table("sj_out")
        .select("click_id", "purchase_id").as[(Long, Long)]
        .collect().toSet
      assert(rows === Set((100L, 200L), (101L, 201L)))
    } finally q.stop()
  }

  test("the same join runs in batch mode with identical semantics to rangeJoin") {
    val out = StreamJoin.clicksWithPurchases(
      graft.util.Tables.events(spark, sf).filter(col("event_type") === "click"),
      graft.util.Tables.events(spark, sf).filter(col("event_type") === "purchase"))
    val expected = graft.queries.Analytics.rangeJoin(spark, sf)
    assert(out.count() === expected.count())
  }
}
