package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

/** Streaming form of the Ticker DSv2 source: tick-index offsets,
  * admission-controlled batch sizes, and exact batch-equivalence of the
  * streamed content (deterministic generator ⇒ exactly-once replay). */
class TickerStreamSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drains the table; content equals the batch read") {
    val ckpt = Files.createTempDirectory("ticker-ckpt").toString
    val stream = spark.readStream.format("graft.sources.Ticker")
      .option("coins", "3").option("exchanges", "2").option("ticks", "40")
      .load()
    val q = stream.writeStream
      .format("memory").queryName("ticker_stream")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("ticker_stream")
      .orderBy("coin_id", "exchange", "tick")
      .as[(String, String, Long, java.sql.Timestamp, Long, Long)].collect()
    val batch = spark.read.format("graft.sources.Ticker")
      .option("coins", "3").option("exchanges", "2").option("ticks", "40")
      .load()
      .orderBy("coin_id", "exchange", "tick")
      .as[(String, String, Long, java.sql.Timestamp, Long, Long)].collect()
    assert(streamed.length === 3 * 2 * 40)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("admission control bounds each micro-batch by maxRows/pairs") {
    val ckpt = Files.createTempDirectory("ticker-ckpt2").toString
    val stream = spark.readStream.format("graft.sources.Ticker")
      .option("coins", "2").option("exchanges", "2").option("ticks", "30")
      .option("maxTicksPerBatch", "5") // 4 pairs × 5 ticks = 20 rows/batch
      .load()
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes += df.count(); ()
      }
      .start()
    q.awaitTermination(60000)
    assert(batchSizes.sum === 2L * 2 * 30)
    assert(batchSizes.length === 6) // admission control splits the backlog
    assert(batchSizes.forall(_ === 20L))
  }
}
