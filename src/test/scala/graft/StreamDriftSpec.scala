package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamDrift
import graft.util.Tables

case class DriftEv(ts: Timestamp, event_type: String, value: Double)

class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = DriftEv
  private def Ev(ts: Timestamp, et: String, v: Double) = DriftEv(ts, et, v)

  private val split = "2024-01-15 00:00:00"

  private lazy val ref = StreamDrift.referenceBins(spark, sf).cache()

  private lazy val current: Seq[Ev] = Tables.events(spark, sf)
    .filter($"ts" >= lit(split).cast("timestamp"))
    .select($"ts", $"event_type", $"value")
    .orderBy($"ts")
    .as[Ev].collect().toSeq

  test("windowed streaming PSI equals the batch PSI of the same windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamDrift.windowedBins(mem.toDF(), ref)
      .writeStream.format("memory").queryName("drift_bins")
      .outputMode("append").start()
    try {
      val n = current.length
      Seq(current.take(n / 2), current.drop(n / 2)).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      // sentinel far past the data: advances the watermark so every real
      // window closes and is appended; its own window never closes
      mem.addData(Ev(Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
      q.processAllAvailable()
      val streamed = StreamDrift.psiPerWindow(spark.table("drift_bins"), ref)
        .as[(Timestamp, String, Long, Double)].collect().toSet
      // batch recount of the same rows through the same window fn
      val batchBins = current.toDS()
        .join(broadcast(ref.select($"event_type", $"lo", $"hi").distinct()),
          Seq("event_type"))
        .withColumn("cents", round($"value" * 100).cast("long"))
        .withColumn("bin", StreamDrift.binOf($"cents", $"lo", $"hi"))
        .groupBy(window($"ts", "6 hours"), $"event_type", $"bin")
        .agg(count(lit(1)).as("nc"))
        .select($"window.start".as("win_start"), $"event_type", $"bin", $"nc")
      val expected = StreamDrift.psiPerWindow(batchBins, ref)
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === expected)
      assert(streamed.nonEmpty)
      // every PSI is a finite non-negative divergence
      assert(streamed.forall { case (_, _, _, p) => p >= 0.0 && !p.isNaN })
    } finally q.stop()
  }

  test("crash-replay: restart from checkpoint emits no duplicate windows") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("drift_ck").toString
    val out = java.nio.file.Files.createTempDirectory("drift_out").toString
    val mem = MemoryStream[Ev]
    def start() = StreamDrift.windowedBins(mem.toDF(), ref)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val n = current.length
    val q1 = start()
    try { mem.addData(current.take(n / 2)); q1.processAllAvailable() }
    finally q1.stop() // "crash" between micro-batches
    // rows arriving while the query is down are picked up on restart
    mem.addData(current.drop(n / 2))
    mem.addData(Ev(Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // committed view (file-sink metadata log): each (window, type, bin)
    // exactly once — the restart must not re-emit batch-1 windows
    val sink = spark.read.parquet(out)
    val dups = sink.groupBy($"win_start", $"event_type", $"bin")
      .count().filter($"count" > 1).count()
    assert(dups === 0L)
    // and the replayed stream still reproduces the batch PSI exactly
    val streamed = StreamDrift.psiPerWindow(sink, ref)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batchBins = current.toDS()
      .join(broadcast(ref.select($"event_type", $"lo", $"hi").distinct()),
        Seq("event_type"))
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("bin", StreamDrift.binOf($"cents", $"lo", $"hi"))
      .groupBy(window($"ts", "6 hours"), $"event_type", $"bin")
      .agg(count(lit(1)).as("nc"))
      .select($"window.start".as("win_start"), $"event_type", $"bin", $"nc")
    val expected = StreamDrift.psiPerWindow(batchBins, ref)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("late rows beyond the watermark are dropped from closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamDrift.windowedBins(mem.toDF(), ref,
        windowLen = "6 hours", watermark = "1 hour")
      .writeStream.format("memory").queryName("drift_late")
      .outputMode("append").start()
    try {
      mem.addData(Ev(Timestamp.valueOf("2024-01-16 01:00:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far past the first window, closing it
      mem.addData(Ev(Timestamp.valueOf("2024-01-20 00:00:00"), "view", 5.0))
      q.processAllAvailable()
      val closed = spark.table("drift_late")
        .filter($"win_start" === Timestamp.valueOf("2024-01-16 00:00:00"))
        .agg(sum($"nc")).as[Long].head()
      // a late row for the closed window must not reopen or change it
      mem.addData(Ev(Timestamp.valueOf("2024-01-16 01:30:00"), "view", 5.0))
      q.processAllAvailable()
      val after = spark.table("drift_late")
        .filter($"win_start" === Timestamp.valueOf("2024-01-16 00:00:00"))
        .agg(sum($"nc")).as[Long].head()
      assert(after === closed)
    } finally q.stop()
  }
}
