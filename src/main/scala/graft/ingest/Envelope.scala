package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Envelope assembly and demultiplexing — the parse/projection/generation
  * surface of the reference (P1-P8 in SURVEY.md §2.3).
  *
  * The reference carries one JSON envelope with four nested entity arrays
  * per ingest batch (reference `dags/crypto_data_streaming.py:143-148`) and
  * demuxes it in Spark with `from_json` + four `explode` projections
  * (reference `spark-streaming.py:269-295`). Identical dataflow here, as
  * pure column expressions: binary→string cast (P1), schema'd `from_json`
  * (P2), struct flatten (P3), `explode` (P4 — Catalyst `Generate`, no
  * custom UDTF needed), ISO-8601 `to_timestamp` (P6), processing-time
  * stamp (P7, injectable for deterministic tests).
  */
object Envelope {

  /** P1+P2+P3: value bytes/string → parsed envelope columns. */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), Schemas.envelopeSchema).as("data"))
      .select("data.*")

  /** The four demuxed entity streams. */
  final case class Demuxed(
      coins: DataFrame,
      price: DataFrame,
      ohlc: DataFrame,
      marketCap: DataFrame)

  /** P4-P8: explode each envelope array into a row stream.
    *
    * @param mcapTs market-cap rows carry no event time in the envelope
    *               (reference `dags/crypto_data_streaming.py:130-138`), so
    *               the reference stamps processing time
    *               (`spark-streaming.py:294`); pass a fixed value for
    *               deterministic tests.
    */
  def demux(env: DataFrame, mcapTs: Option[Timestamp] = None): Demuxed = {
    def entities(arrayCol: String, alias: String): DataFrame =
      env.select(explode(col(arrayCol)).as(alias)).select(s"$alias.*")
    val stamp: Column = mcapTs.map(t => lit(t)).getOrElse(current_timestamp())
    Demuxed(
      coins = entities("coins", "coin"),
      price = entities("price_data", "price")
        .withColumn("timestamp", to_timestamp(col("timestamp"))),
      ohlc = entities("ohlc_data", "ohlc")
        .withColumn("timestamp", to_timestamp(col("timestamp"))),
      marketCap = entities("coin_market_cap", "market_cap")
        .withColumn("timestamp", stamp))
  }

  /** Inverse direction (the ingestion side's `json.dumps`, C7): pack
    * entity rows into one JSON envelope per group. Aggregation is a
    * single `collect_list(struct(...))` per entity per group — fine for
    * envelope-sized groups (the reference's envelopes are ~550 rows), not
    * meant for unbounded groups. */
  def buildEnvelopes(price: DataFrame, groupCols: Seq[Column]): DataFrame = {
    val entity = struct(
      col("coin_id"), col("exchange"),
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp"),
      col("price"), col("volume_24h"), col("percent_change_24h"))
    price
      .groupBy(groupCols: _*)
      .agg(sort_array(collect_list(entity)).as("price_data"))
      .select(to_json(struct(
        array().cast(org.apache.spark.sql.types.ArrayType(Schemas.coinSchema)).as("coins"),
        col("price_data"),
        array().cast(org.apache.spark.sql.types.ArrayType(Schemas.ohlcSchema)).as("ohlc_data"),
        array().cast(org.apache.spark.sql.types.ArrayType(Schemas.marketCapSchema)).as("coin_market_cap")
      )).as("value"))
  }
}
