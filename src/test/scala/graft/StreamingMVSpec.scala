package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingMV

class StreamingMVSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, min: Int, v: Double) =
    (id, user, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), v)

  test("MV state after three micro-batches equals the one-shot batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("mv").toString
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val all = Seq(
      ev(0, 1, 1, 1.25), ev(1, 2, 2, 2.50),
      ev(2, 1, 3, 0.75), ev(3, 3, 4, 10.00),
      ev(4, 2, 5, 0.01), ev(5, 1, 6, 3.00))
    val q = StreamingMV.attach(
      in.toDF().toDF("event_id", "user_id", "ts", "value"),
      dir, Files.createTempDirectory("mvck").toString)
    try {
      all.grouped(2).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val state = StreamingMV.readState(spark, dir).get
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val oneShot = StreamingMV.partial(
          all.toDF("event_id", "user_id", "ts", "value"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(state === oneShot)
      assert(state.map(_._1) === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("replaying a batch is idempotent: read-below-own-id pre-state, same result") {
    val dir = Files.createTempDirectory("mv2").toString
    val b0 = Seq(ev(0, 1, 1, 1.00), ev(1, 2, 2, 2.00))
      .toDF("event_id", "user_id", "ts", "value")
    val b1 = Seq(ev(2, 1, 3, 5.00)).toDF("event_id", "user_id", "ts", "value")
    StreamingMV.mergeBatch(b0, dir, batchId = 0L)
    StreamingMV.mergeBatch(b1, dir, batchId = 1L)
    val once = StreamingMV.readState(spark, dir).get
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // crash-replay of batch 1: merges against gen<1 again, overwrites gen=1
    StreamingMV.mergeBatch(b1, dir, batchId = 1L)
    val twice = StreamingMV.readState(spark, dir).get
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(twice === once) // no double counting
    assert(once.find(_._1 == 1L).get._3 === 600L) // 1.00 + 5.00 in cents
  }

  test("old generations give time travel: state as of before batch 1") {
    val dir = Files.createTempDirectory("mv3").toString
    StreamingMV.mergeBatch(
      Seq(ev(0, 7, 1, 4.00)).toDF("event_id", "user_id", "ts", "value"),
      dir, batchId = 0L)
    StreamingMV.mergeBatch(
      Seq(ev(1, 7, 2, 6.00)).toDF("event_id", "user_id", "ts", "value"),
      dir, batchId = 1L)
    val asOf0 = StreamingMV.readState(spark, dir, belowGen = 1L).get
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(asOf0.head._2 === 1L)   // one event
    assert(asOf0.head._3 === 400L) // 4.00 only
  }
}
