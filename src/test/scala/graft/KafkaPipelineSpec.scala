package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.MockKafka
import graft.streaming.KafkaPipeline

/** S1/K3 through the Kafka-wire mock: the SAME KafkaPipeline code a real
  * broker deployment runs (option surface, wire schema, P1 cast, demux,
  * sink), with only the format string swapped for
  * `graft.sources.MockKafka`; plus the documented behavior of the real
  * `format("kafka")` in this jar-less sandbox. */
class KafkaPipelineSpec extends SparkSpec {

  private val MockFormat = "graft.sources.MockKafka"

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

  test("mock source exposes Kafka's exact wire schema") {
    val dir = tmp("mk_schema")
    Files.writeString(dir.resolve("b.json"), envelope(Seq(
      ("binance_BTC", "binance", "2024-01-01T00:00:00.000000", 1.0))))
    val df = spark.readStream.format(MockFormat)
      .option("subscribe", "prices").option("lines.dir", dir.toString).load()
    assert(df.schema === MockKafka.Schema)
    assert(df.isStreaming)
  }

  test("consumer: envelope -> demux -> upsert sink end-to-end over the kafka wire shape") {
    val (src, sink, ckpt) = (tmp("mk_src"), tmp("mk_sink"), tmp("mk_ckpt"))
    val mcapTs = Some(Timestamp.valueOf("2024-01-01 00:00:00"))
    Files.writeString(src.resolve("b1.json"), envelope(Seq(
      ("binance_BTC", "binance", "2024-01-01T00:00:00.000000", 100.0),
      ("binance_BTC", "binance", "2024-01-01T00:05:00.000000", 101.0),
      ("kraken_BTC", "kraken", "2024-01-01T00:05:00.000000", 99.0))))
    KafkaPipeline.start(spark, "mock:9092", "prices",
        sink.toString, ckpt.toString, availableNow = true, mcapTs = mcapTs,
        format = MockFormat,
        extraOptions = Map("lines.dir" -> src.toString))
      .awaitTermination()
    def table(name: String) = spark.read.parquet(s"$sink/$name")
    assert(table("coins").count() === 1)
    assert(table("price_data").count() === 3)
    assert(table("coin_market_cap").count() === 1)
    assert(table("technical_indicators").count() === 3)
    val prices = table("price_data")
      .select("coin_id", "price").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(prices === Set(("binance_BTC", 100.0), ("binance_BTC", 101.0),
      ("kraken_BTC", 99.0)))
  }

  test("producer: envelopes publish as kafka-wire (key,value) bytes and parse back") {
    import spark.implicits._
    MockKafka.reset()
    val price = Seq(
      ("binance_BTC", "binance", Timestamp.valueOf("2024-01-01 00:00:00"), 100.0, 1.0, 0.0),
      ("kraken_BTC", "kraken", Timestamp.valueOf("2024-01-01 00:05:00"), 99.0, 1.0, 0.0))
      .toDF("coin_id", "exchange", "timestamp", "price", "volume_24h", "percent_change_24h")
    KafkaPipeline.writeEnvelopes(price, "mock:9092", "prices", format = MockFormat)
    val produced = MockKafka.produced.toArray(Array.empty[(Array[Byte], Array[Byte], String)])
    assert(produced.length === 2) // one envelope per exchange group
    assert(produced.forall(_._3 === "prices"))
    // the published bytes round-trip through the consumer-side parse (C7
    // inverse of P1/P2): every price row comes back intact
    val values = produced.map(r => new String(r._2, java.nio.charset.StandardCharsets.UTF_8))
    val back = graft.ingest.Envelope.demux(
      graft.ingest.Envelope.parse(values.toSeq.toDF("value"))).price
    assert(back.count() === 2)
    assert(back.select("coin_id").as[String].collect().toSet ===
      Set("binance_BTC", "kraken_BTC"))
  }

  test("format(\"kafka\") in this sandbox stops at resolution with the deploy guidance") {
    // no spark-sql-kafka jar ships here; the default-format path must
    // fail with Spark's standard find-data-source error naming kafka —
    // proof the code reaches genuine Kafka resolution and a deploy only
    // needs the jar on the classpath, not a code change
    val e = intercept[Exception] {
      KafkaPipeline.start(spark, "localhost:9092", "prices",
        tmp("k_sink").toString, tmp("k_ckpt").toString, availableNow = true)
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("kafka"),
      s"unexpected error: $e")
  }
}
