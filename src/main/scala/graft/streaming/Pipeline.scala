package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.indicators.Indicators
import graft.ingest.Envelope
import graft.sink.Router

/** The streaming ETL pipeline: envelope source → demux → multiplex upsert
  * sink → indicator derivation. The Spark-native re-expression of the
  * reference's `spark-streaming.py` job, with its three structural defects
  * fixed (SURVEY.md §2.11):
  *
  *   - T8: the reference runs 5 independent streaming queries, each
  *     re-reading Kafka; we run ONE query and fan out inside
  *     `foreachBatch` — one source read per micro-batch.
  *   - T6: the reference configures no checkpoint (no recovery, at-least-
  *     once with unbounded replay); `checkpointLocation` is mandatory here.
  *   - T7: the reference applies a grouped-map pandas UDF directly on a
  *     streaming DataFrame, which Spark's UnsupportedOperationChecker
  *     rejects — its *intent* is per-trigger indicator recomputation. We
  *     compute indicators inside `foreachBatch` over the upserted price
  *     table (batch DataFrame → window expressions), which is legal,
  *     deterministic, and matches that intent.
  *
  * The source is a line-delimited JSON file stream (one envelope per
  * line) — the same `value: String` shape a Kafka source yields after the
  * P1 cast. [[KafkaPipeline.start]] is the `format("kafka")` face of the
  * same pipeline (exercised against the Kafka-wire mock in
  * KafkaPipelineSpec; at deploy time only the jar is missing here).
  */
object Pipeline {

  /** Start the pipeline.
    *
    * @param sourceDir     directory of line-delimited envelope JSON files
    * @param sinkDir       base dir for the five upsert tables
    * @param checkpointDir streaming checkpoint location (T6 fix)
    * @param availableNow  drain-available-then-stop trigger (for tests /
    *                      batch catch-up) vs continuous micro-batches
    * @param mcapTs        fixed processing-time stamp for market-cap rows
    *                      (deterministic tests); None → current_timestamp
    */
  def start(
      spark: SparkSession,
      sourceDir: String,
      sinkDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      mcapTs: Option[Timestamp] = None): StreamingQuery = {
    val raw = spark.readStream.text(sourceDir)
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, sinkDir, mcapTs)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** One micro-batch: parse → demux → upsert the four entity tables →
    * recompute indicators for the keys present in this batch. */
  def processBatch(spark: SparkSession, batch: DataFrame, sinkDir: String,
      mcapTs: Option[Timestamp] = None): Unit = {
    val d = Envelope.demux(Envelope.parse(batch), mcapTs)
    Router.writeBatch(spark, sinkDir, Seq(d.coins, d.price, d.ohlc, d.marketCap))
    deriveIndicators(spark, sinkDir,
      Some(d.price.select(col("coin_id"), col("exchange")).distinct()))
  }

  /** T7: indicator derivation over the price table, restricted to the
    * series keys touched by the current batch (left-semi join against the
    * batch's key set) — per-batch cost scales with the batch's keys, not
    * with total accumulated history. Written through the same upsert sink
    * (update-mode semantics — recomputed rows replace prior values on
    * their PK). Pass `batchKeys=None` to recompute everything (backfill).
    *
    * For strict O(batch) incremental cost use
    * [[StatefulIndicators.attach]], which carries per-key state across
    * batches instead of re-reading each touched key's history. */
  def deriveIndicators(spark: SparkSession, sinkDir: String,
      batchKeys: Option[DataFrame] = None): Unit = {
    val priceDir = s"$sinkDir/price_data"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(priceDir))) {
      val all = spark.read.parquet(priceDir)
      val price = batchKeys match {
        case Some(keys) =>
          all.join(broadcast(keys), Seq("coin_id", "exchange"), "left_semi")
        case None => all
      }
      val ind = Indicators.withIndicators(
          price,
          keys = Seq("coin_id", "exchange"),
          order = Seq(col("timestamp")),
          value = col("price"))
        .select(col("coin_id"), col("exchange"), col("timestamp"),
          col("sma_20"), col("ema_20"), col("rsi_14"), col("macd"))
      Router.upsert(spark, ind, "technical_indicators", sinkDir)
    }
  }
}
