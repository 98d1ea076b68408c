package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamTail
import graft.util.Tables

case class TailEv(ts: Timestamp, event_type: String, value: Double)

/** The windowed tail monitor is exactly-once and batch-equivalent: a
  * window's streaming P95/tail-mean equal the batch face on the same
  * rows, survive a crash-replay without duplicate emission, and ignore
  * late rows beyond the watermark — the StreamDriftSpec rigor. */
class StreamTailSpec extends SparkSpec {
  import spark.implicits._

  private val split = "2024-01-15 00:00:00"

  private lazy val current: Seq[TailEv] = Tables.events(spark, sf)
    .filter($"ts" >= lit(split).cast("timestamp"))
    .select($"ts", $"event_type", $"value")
    .orderBy($"ts")
    .as[TailEv].collect().toSeq

  private def batchExpected = StreamTail.tailPerWindow(
    current.toDS()
      .select($"ts", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .groupBy(window($"ts", "6 hours"), $"event_type", $"cents")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("win_start"), $"event_type",
        $"cents", $"cnt"))
    .as[(Timestamp, String, Long, Double, Option[Double])].collect().toSet

  test("streaming window P95 equals the batch face on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TailEv]
    val q = StreamTail.windowedCents(mem.toDF())
      .writeStream.format("memory").queryName("tail_hist")
      .outputMode("append").start()
    try {
      val n = current.length
      Seq(current.take(n / 2), current.drop(n / 2)).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      // sentinel advances the watermark so every real window closes
      mem.addData(TailEv(Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
      q.processAllAvailable()
      val streamed = StreamTail.tailPerWindow(spark.table("tail_hist"))
        .as[(Timestamp, String, Long, Double, Option[Double])].collect().toSet
      assert(streamed === batchExpected)
      assert(streamed.nonEmpty)
      streamed.foreach { case (_, _, nn, p95, tail) =>
        assert(nn > 0)
        tail.foreach(t => assert(t >= p95 - 1e-9,
          "strict-tail mean cannot fall below its quantile"))
      }
    } finally q.stop()
  }

  test("crash-replay: checkpoint restart emits each window histogram exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tail_ck").toString
    val out = java.nio.file.Files.createTempDirectory("tail_out").toString
    val mem = MemoryStream[TailEv]
    def start() = StreamTail.windowedCents(mem.toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val n = current.length
    val q1 = start()
    try { mem.addData(current.take(n / 2)); q1.processAllAvailable() }
    finally q1.stop() // "crash" between micro-batches
    mem.addData(current.drop(n / 2))
    mem.addData(TailEv(Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val sink = spark.read.parquet(out)
    val dups = sink.groupBy($"win_start", $"event_type", $"cents")
      .count().filter($"count" > 1).count()
    assert(dups === 0L)
    val streamed = StreamTail.tailPerWindow(sink)
      .as[(Timestamp, String, Long, Double, Option[Double])].collect().toSet
    assert(streamed === batchExpected)
    assert(streamed.nonEmpty)
  }

  test("late rows beyond the watermark cannot move a closed window's quantile") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TailEv]
    val q = StreamTail.windowedCents(mem.toDF())
      .writeStream.format("memory").queryName("tail_late")
      .outputMode("append").start()
    try {
      mem.addData(TailEv(Timestamp.valueOf("2024-01-16 01:00:00"), "view", 5.0))
      q.processAllAvailable()
      mem.addData(TailEv(Timestamp.valueOf("2024-01-20 00:00:00"), "view", 5.0))
      q.processAllAvailable()
      def winRows() = spark.table("tail_late")
        .filter($"win_start" === Timestamp.valueOf("2024-01-16 00:00:00"))
        .agg(coalesce(sum($"cnt"), lit(0L))).as[Long].head()
      val closed = winRows()
      // an extreme late value must not reopen the window or shift P95
      mem.addData(TailEv(Timestamp.valueOf("2024-01-16 01:30:00"), "view", 999.0))
      q.processAllAvailable()
      assert(winRows() === closed)
    } finally q.stop()
  }
}
