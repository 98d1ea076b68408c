package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.streaming.Pipeline

/** End-to-end streaming pipeline: file envelope source → demux →
  * multiplex upsert sink → indicator derivation, with checkpointed
  * exactly-once-per-file processing and last-write-wins upsert semantics
  * (the reference's Cassandra-PK behavior, modeled explicitly). */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def envelope(priceRows: Seq[(String, String, String, Double)]): String = {
    val price = priceRows.map { case (c, e, t, p) =>
      s"""{"coin_id":"$c","exchange":"$e","timestamp":"$t","price":$p,"volume_24h":1.0,"percent_change_24h":0.0}"""
    }.mkString(",")
    s"""{"coins":[{"id":"binance_BTC","name":"Bitcoin","symbol":"BTC"}],"price_data":[$price],"ohlc_data":[],"coin_market_cap":[{"coin_symbol":"btc","market_cap_percentage":50.0}]}"""
  }

  test("pipeline drains the source, upserts all tables, derives indicators, and replays nothing") {
    val (src, sink, ckpt) = (tmp("src"), tmp("sink"), tmp("ckpt"))
    val mcapTs = Some(Timestamp.valueOf("2024-01-01 00:00:00"))

    // batch 1: 3 price rows over 2 keys
    Files.writeString(src.resolve("b1.json"), envelope(Seq(
      ("binance_BTC", "binance", "2024-01-01T00:00:00.000000", 100.0),
      ("binance_BTC", "binance", "2024-01-01T00:05:00.000000", 101.0),
      ("kraken_BTC", "kraken", "2024-01-01T00:05:00.000000", 99.0))))
    Pipeline.start(spark, src.toString, sink.toString, ckpt.toString,
      availableNow = true, mcapTs = mcapTs).awaitTermination()

    def table(name: String) = spark.read.parquet(s"$sink/$name")
    assert(table("coins").count() === 1)
    assert(table("price_data").count() === 3)
    assert(table("coin_market_cap").count() === 1)
    assert(table("technical_indicators").count() === 3)

    // batch 2: redelivery of an existing PK with a NEW price + one new row
    Files.writeString(src.resolve("b2.json"), envelope(Seq(
      ("binance_BTC", "binance", "2024-01-01T00:05:00.000000", 555.0),
      ("binance_BTC", "binance", "2024-01-01T00:10:00.000000", 102.0))))
    Pipeline.start(spark, src.toString, sink.toString, ckpt.toString,
      availableNow = true, mcapTs = mcapTs).awaitTermination()

    assert(table("price_data").count() === 4) // 3 + 1 new, 1 upserted in place
    val upserted = table("price_data")
      .where("exchange = 'binance' AND timestamp = timestamp'2024-01-01 00:05:00'")
      .select("price").collect().map(_.getDouble(0)).toSeq
    assert(upserted === Seq(555.0)) // newer batch wins the PK collision
    assert(table("technical_indicators").count() === 4)

    // batch 3: nothing new — checkpoint prevents replay, tables unchanged
    Pipeline.start(spark, src.toString, sink.toString, ckpt.toString,
      availableNow = true, mcapTs = mcapTs).awaitTermination()
    assert(table("price_data").count() === 4)
    assert(table("coins").count() === 1)
  }
}
