package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Data model of the engine, derived from the reference's entity shapes
  * (crypto ETL pipeline; see SURVEY.md §1).
  *
  * The reference carries one JSON *envelope* per ingest batch on a Kafka
  * topic, holding four nested entity arrays (reference
  * `dags/crypto_data_streaming.py:143-148`, parsed with a declared schema at
  * `spark-streaming.py:216-267`). We model the same envelope as a
  * `StructType` with four `ArrayType(StructType)` fields plus typed case
  * classes for `Dataset[T]` boundaries.
  *
  * Numeric policy: the reference computes in float64 and only converts to
  * DECIMAL at its Cassandra sink (SURVEY.md §1.2) — we use `DoubleType`
  * end-to-end, matching actual compute semantics.
  */
object Schemas {

  // ---- typed entities ---------------------------------------------------

  /** Dimension: one coin (reference `spark-streaming.py:52-61`). */
  final case class Coin(id: String, name: String, symbol: String)

  /** Fact: one ticker observation per (coin, exchange, ts)
    * (reference `spark-streaming.py:62-77`). */
  final case class PriceTick(
      coin_id: String,
      exchange: String,
      timestamp: Timestamp,
      price: Double,
      volume_24h: Double,
      percent_change_24h: Double)

  /** Fact: latest OHLC bar per (coin, exchange, timeframe)
    * (reference `spark-streaming.py:78-91`). */
  final case class OhlcBar(
      coin_id: String,
      exchange: String,
      timestamp: Timestamp,
      timeframe: String,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      change: Double)

  /** Fact: global market-cap share per symbol
    * (reference `spark-streaming.py:106-115`). */
  final case class MarketCapShare(
      coin_symbol: String,
      market_cap_percentage: Double,
      timestamp: Timestamp)

  /** Derived: per-(coin, exchange, ts) technical indicators
    * (reference `spark-streaming.py:92-105`). Nullable values model the
    * leading-window nulls of rolling math. */
  final case class IndicatorRow(
      coin_id: String,
      exchange: String,
      timestamp: Timestamp,
      sma_20: Option[Double],
      ema_20: Option[Double],
      rsi_14: Option[Double],
      macd: Option[Double])

  // ---- envelope schema --------------------------------------------------

  val coinSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("symbol", StringType)))

  val priceSchema: StructType = StructType(Seq(
    StructField("coin_id", StringType),
    StructField("exchange", StringType),
    StructField("timestamp", StringType), // ISO-8601; parsed with to_timestamp
    StructField("price", DoubleType),
    StructField("volume_24h", DoubleType),
    StructField("percent_change_24h", DoubleType)))

  val ohlcSchema: StructType = StructType(Seq(
    StructField("coin_id", StringType),
    StructField("exchange", StringType),
    StructField("timestamp", StringType),
    StructField("timeframe", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("change", DoubleType)))

  val marketCapSchema: StructType = StructType(Seq(
    StructField("coin_symbol", StringType),
    StructField("market_cap_percentage", DoubleType)))

  /** The four-array envelope (reference `spark-streaming.py:260-267`). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("coins", ArrayType(coinSchema)),
    StructField("price_data", ArrayType(priceSchema)),
    StructField("ohlc_data", ArrayType(ohlcSchema)),
    StructField("coin_market_cap", ArrayType(marketCapSchema))))
}
