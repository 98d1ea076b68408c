package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Schemas.PriceTick
import graft.streaming.WindowedStats

class WindowedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tick(min: Int, p: Double) =
    PriceTick("btc", "binance", Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), p, 0, 0)

  test("append-mode windows emit exactly when the watermark passes them; late data is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PriceTick]
    val q = WindowedStats.tumblingTickStats(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      // window [00:00, 00:05): three ticks
      mem.addData(tick(0, 100.0), tick(2, 110.0), tick(4, 90.0))
      q.processAllAvailable()
      assert(spark.table("win_out").count() === 0) // watermark not past window end

      // event time jumps to 00:20 -> watermark 00:10 -> first window closes
      mem.addData(tick(20, 50.0))
      q.processAllAvailable()
      val closed = spark.table("win_out")
        .selectExpr("window_start", "n_ticks", "avg_price", "min_price", "max_price")
        .as[(Timestamp, Long, Double, Double, Double)].collect()
      assert(closed.toSeq === Seq(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 3L, 100.0, 90.0, 110.0)))

      // a tick 15 min late (00:03, watermark already at 00:10) is dropped
      mem.addData(tick(3, 999.0))
      mem.addData(tick(40, 60.0)) // close the 00:20 window too
      q.processAllAvailable()
      val all = spark.table("win_out")
        .selectExpr("window_start", "n_ticks").as[(Timestamp, Long)]
        .collect().toMap
      assert(all(Timestamp.valueOf("2024-01-01 00:00:00")) === 3L) // unchanged
      assert(all(Timestamp.valueOf("2024-01-01 00:20:00")) === 1L)
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon re-deliveries exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PriceTick]
    val q = WindowedStats.dedupTicks(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(tick(0, 100.0), tick(0, 100.0)) // in-batch dup
      q.processAllAvailable()
      mem.addData(tick(0, 100.0), tick(1, 101.0)) // cross-batch re-delivery
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .selectExpr("timestamp", "price").as[(Timestamp, Double)]
        .collect().sortBy(_._1.getTime)
      assert(rows.toSeq === Seq(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 100.0),
        (Timestamp.valueOf("2024-01-01 00:01:00"), 101.0)))
    } finally q.stop()
  }

  test("same aggregation runs on a batch frame (watermark is a no-op)") {
    val df = Seq(tick(0, 100.0), tick(2, 110.0), tick(7, 50.0)).toDF()
    val out = WindowedStats.tumblingTickStats(df)
      .selectExpr("window_start", "n_ticks").as[(Timestamp, Long)]
      .collect().sortBy(_._1.getTime)
    assert(out.toSeq === Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 2L),
      (Timestamp.valueOf("2024-01-01 00:05:00"), 1L)))
  }

  test("streaming session windows merge within-gap events and emit on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = WindowedStats.sessionStats(
        mem.toDF().toDF("user_id", "ts"), gap = "10 minutes",
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def ev(u: Long, min: Int) = (u, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"))
    try {
      // one user: burst at 00:00-00:08, then silence past the gap
      mem.addData(ev(1, 0), ev(1, 5), ev(1, 8))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // session still open
      // event at 00:59 -> watermark 00:54 > 00:18 session end -> emit
      mem.addData(ev(1, 59))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .selectExpr("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
      assert(rows.toSeq === Seq((1L,
        Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-01 00:18:00"), // last event + gap
        3L)))
    } finally q.stop()
  }

  test("session windows on a batch frame match the same grouping semantics") {
    val batch = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:05:00"),
      (1L, "2024-01-01 00:40:00"), (2L, "2024-01-01 00:00:00"))
      .map { case (u, t) => (u, Timestamp.valueOf(t)) }
      .toDF("user_id", "ts")
    val out = WindowedStats.sessionStats(batch, gap = "10 minutes")
      .orderBy("user_id", "session_start")
      .selectExpr("user_id", "n_events").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }
}
