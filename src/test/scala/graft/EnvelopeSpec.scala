package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.Envelope

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val envJson =
    """{"coins":[{"id":"binance_BTC","name":"Bitcoin","symbol":"BTC"}],
      |"price_data":[{"coin_id":"binance_BTC","exchange":"binance",
      |"timestamp":"2024-01-01T00:05:00.000000","price":42000.5,
      |"volume_24h":1000.0,"percent_change_24h":0.01}],
      |"ohlc_data":[{"coin_id":"binance_BTC","exchange":"binance",
      |"timestamp":"2024-01-01T00:05:00.000000","timeframe":"1h",
      |"open":41000.0,"high":42500.0,"low":40900.0,"close":42000.5,
      |"change":0.0244}],
      |"coin_market_cap":[{"coin_symbol":"btc","market_cap_percentage":51.2}]}"""
      .stripMargin.replace("\n", "")

  test("parse + demux splits the envelope into four typed entity frames") {
    val raw = Seq(envJson).toDF("value")
    val d = Envelope.demux(Envelope.parse(raw),
      mcapTs = Some(Timestamp.valueOf("2024-01-01 00:05:00")))

    val coin = d.coins.as[(String, String, String)].head()
    assert(coin === (("binance_BTC", "Bitcoin", "BTC")))

    val price = d.price.select("coin_id", "exchange", "timestamp", "price").head()
    assert(price.getString(0) === "binance_BTC")
    assert(price.getTimestamp(2) === Timestamp.valueOf("2024-01-01 00:05:00"))
    assert(price.getDouble(3) === 42000.5)
    assert(d.price.schema("timestamp").dataType.typeName === "timestamp")

    assert(d.ohlc.select("timeframe").as[String].head() === "1h")
    val mc = d.marketCap.select("coin_symbol", "market_cap_percentage", "timestamp").head()
    assert(mc.getString(0) === "btc")
    assert(mc.getDouble(1) === 51.2)
    assert(mc.getTimestamp(2) === Timestamp.valueOf("2024-01-01 00:05:00"))
  }

  test("malformed JSON yields null envelope, not a job failure") {
    val raw = Seq("not json at all").toDF("value")
    val d = Envelope.demux(Envelope.parse(raw))
    assert(d.price.count() === 0)
    assert(d.coins.count() === 0)
  }

  test("build → parse → demux round-trips price rows exactly") {
    val rows = Seq(
      ("1", "click", Timestamp.valueOf("2024-01-02 10:00:00.123456"), 10.5, 1.0, 0.0),
      ("1", "view", Timestamp.valueOf("2024-01-02 11:00:00"), 11.5, 2.0, 0.0),
      ("2", "click", Timestamp.valueOf("2024-01-03 09:00:00"), 9.25, 3.0, 0.0))
      .toDF("coin_id", "exchange", "timestamp", "price", "volume_24h", "percent_change_24h")
    val env = Envelope.buildEnvelopes(rows, Seq(to_date(col("timestamp")).as("day")))
    assert(env.count() === 2) // two distinct days -> two envelopes
    val back = Envelope.demux(Envelope.parse(env)).price
      .orderBy("volume_24h")
      .as[(String, String, Timestamp, Double, Double, Double)].collect()
    val orig = rows.orderBy("volume_24h")
      .as[(String, String, Timestamp, Double, Double, Double)].collect()
    assert(back.toSeq === orig.toSeq)
  }
}
