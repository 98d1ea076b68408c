package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.streaming.KafkaPipeline

/** Real-broker smoke for the Kafka pipeline, gated on an env flag.
  *
  * The sandbox ships no Kafka jars or broker, so by default every test
  * here CANCELS (ScalaTest `assume`) and the suite stays green — the
  * wire-level contract is covered by KafkaPipelineSpec's mock. To run
  * against a real broker:
  *
  * {{{
  * # broker reachable, spark-sql-kafka-0-10 + kafka-clients on the
  * # test classpath:
  * GRAFT_KAFKA_BOOTSTRAP=broker:9092 sbt "testOnly graft.KafkaBrokerSpec"
  * }}}
  *
  * The tests drive the UNMODIFIED production entry points
  * ([[KafkaPipeline.writeEnvelopes]] producer, [[KafkaPipeline.start]]
  * consumer) with their default `format("kafka")` — no code paths exist
  * that only run in tests. A unique topic per run avoids cross-run
  * interference; the broker must allow topic auto-creation (or
  * pre-create the printed topic).
  */
class KafkaBrokerSpec extends SparkSpec {

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
  private val topic = s"graft_smoke_${System.currentTimeMillis()}"

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  test("producer then consumer round-trip through a real broker") {
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (and put spark-sql-kafka on the classpath) to run")
    import spark.implicits._
    val price = Seq(
      ("binance_BTC", "binance", Timestamp.valueOf("2024-01-01 00:00:00"), 100.0, 1.0, 0.0),
      ("kraken_BTC", "kraken", Timestamp.valueOf("2024-01-01 00:05:00"), 99.0, 1.0, 0.0))
      .toDF("coin_id", "exchange", "timestamp", "price", "volume_24h", "percent_change_24h")
    // K3: publish one envelope per exchange group over the real wire
    KafkaPipeline.writeEnvelopes(price, bootstrap.get, topic)
    // S1: consume them back through the full demux/upsert pipeline
    val (sink, ckpt) = (tmp("kb_sink"), tmp("kb_ckpt"))
    KafkaPipeline.start(spark, bootstrap.get, topic,
        sink.toString, ckpt.toString, availableNow = true,
        mcapTs = Some(Timestamp.valueOf("2024-01-01 00:00:00")))
      .awaitTermination()
    val back = spark.read.parquet(s"$sink/price_data")
    assert(back.count() === 2)
    assert(back.select("coin_id").as[String].collect().toSet ===
      Set("binance_BTC", "kraken_BTC"))
  }

  test("consumer restart from checkpoint does not replay into the sink") {
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (and put spark-sql-kafka on the classpath) to run")
    val (sink, ckpt) = (tmp("kb_sink2"), tmp("kb_ckpt2"))
    def runOnce(): Unit =
      KafkaPipeline.start(spark, bootstrap.get, topic,
          sink.toString, ckpt.toString, availableNow = true,
          mcapTs = Some(Timestamp.valueOf("2024-01-01 00:00:00")))
        .awaitTermination()
    runOnce()
    val n1 = spark.read.parquet(s"$sink/price_data").count()
    runOnce() // same checkpoint: no new offsets, no duplicate rows
    assert(spark.read.parquet(s"$sink/price_data").count() === n1)
  }
}
