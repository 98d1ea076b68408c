package graft.sources

import java.security.MessageDigest
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table modeling the reference's exchange-feed extract
  * (`dags/crypto_data_streaming.py:58-141`, SURVEY.md §2.1 S2/S3) as a
  * Spark-native TABLE instead of a driver-side REST loop: a deterministic
  * tick stream over (coin × exchange × tick), generated closed-form per
  * row so the scan is embarrassingly parallel — no sequential walk, no
  * network, no driver bottleneck.
  *
  * Spark-first surface demonstrated here:
  *   - `TableProvider` → `ScanBuilder` → `Batch` → `PartitionReader`;
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *     materializes only requested fields — a `select(count)` generates
  *     no strings at all;
  *   - **filter pushdown** (`SupportsPushDownFilters`): tick-range
  *     predicates narrow the generated range per partition; coin/exchange
  *     equality prunes whole partitions AT PLANNING TIME (the DSv2
  *     analogue of parquet row-group pruning — at 100 TB of ticks this is
  *     the difference between scanning one symbol and the universe);
  *   - **deterministic content**: price/volume derive from md5 of
  *     `"coin|exchange|tick"`, so any engine (the DuckDB oracle included)
  *     reproduces the table bit-for-bit; integers until one division.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.Ticker")
  *     .option("coins", 20).option("exchanges", 9).option("ticks", 500)
  *     .load()
  * }}}
  */
class Ticker extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Ticker.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TickerTable(TickerConfig(properties.asScala.toMap))
  override def supportsExternalMetadata(): Boolean = false
}

object Ticker {
  val Schema: StructType = StructType(Seq(
    StructField("coin_id", StringType, nullable = false),
    StructField("exchange", StringType, nullable = false),
    StructField("tick", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("price_cents", LongType, nullable = false),
    StructField("volume_milli", LongType, nullable = false)))

  /** Deterministic row content: first 12 hex digits of
    * `md5("<coin>|<exchange>|<tick>")` as an unsigned integer `h`;
    * price_cents = 100000 + h % 900000, volume_milli = 1000 + h % 99000.
    * Mirrors the DuckDB expression in the q_ticker oracle exactly. */
  def hash12(coin: String, exchange: String, tick: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$coin|$exchange|$tick".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }
  def priceCents(h: Long): Long = 100000L + h % 900000L
  def volumeMilli(h: Long): Long = 1000L + h % 99000L
}

/** Generation parameters; coins are `coin00..`, exchanges `ex0..`. */
case class TickerConfig(
    nCoins: Int, nExchanges: Int, nTicks: Long,
    startEpochSec: Long, intervalSec: Long,
    maxTicksPerBatch: Long) {
  def coinName(i: Int): String = f"coin$i%02d"
  def exchangeName(i: Int): String = s"ex$i"
  def coins: Seq[String] = (0 until nCoins).map(coinName)
  def exchanges: Seq[String] = (0 until nExchanges).map(exchangeName)
}

object TickerConfig {
  def apply(opts: Map[String, String]): TickerConfig = TickerConfig(
    nCoins = opts.getOrElse("coins", "20").toInt,
    nExchanges = opts.getOrElse("exchanges", "9").toInt,
    nTicks = opts.getOrElse("ticks", "500").toLong,
    startEpochSec = opts.getOrElse("start", "1704067200").toLong, // 2024-01-01
    intervalSec = opts.getOrElse("interval", "300").toLong,       // 5 min (S2 cadence)
    maxTicksPerBatch = opts.getOrElse("maxTicksPerBatch", "100").toLong)
}

/** Queries over the [[Ticker]] DSv2 source. The scale-factor dir is
  * ignored — the source is parameter-defined, so the oracle reproduces
  * it from `range()` + md5 instead of parquet. */
object TickerQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Per-coin summary of one exchange's tick window: the pushed
    * exchange-equality prunes 8/9 of the partitions at planning time and
    * the tick range narrows generation inside each reader; the aggregate
    * is map-side combinable on top. */
  def summary(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.Ticker").load()
      .filter(col("exchange") === "ex0" &&
              col("tick") >= 100L && col("tick") < 400L)
      .groupBy(col("coin_id"))
      .agg(
        count(lit(1)).as("n_ticks"),
        sum(col("price_cents")).as("sum_price_cents"),
        min(col("price_cents")).as("min_price_cents"),
        max(col("price_cents")).as("max_price_cents"),
        sum(col("volume_milli")).as("sum_volume_milli"))
      .orderBy(col("coin_id"))
}

class TickerTable(config: TickerConfig) extends Table with SupportsRead {
  override def name(): String = "ticker"
  override def schema(): StructType = Ticker.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TickerScanBuilder(config)
}

/** Scan builder accumulating pruned columns + pushed filters. */
class TickerScanBuilder(config: TickerConfig)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var requiredSchema: StructType = Ticker.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** Accept (and fully evaluate) coin/exchange equality+IN and tick
    * range filters; everything else stays a Spark-side Filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("coin_id" | "exchange", _: String) => true
      case In("coin_id" | "exchange", vs) => vs.forall(_.isInstanceOf[String])
      case GreaterThan("tick", _: Long) | GreaterThanOrEqual("tick", _: Long) |
           LessThan("tick", _: Long) | LessThanOrEqual("tick", _: Long) => true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new TickerScan(config, requiredSchema, pushed)
}

class TickerScan(config: TickerConfig, requiredSchema: StructType,
    filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TickerMicroBatchStream(config, requiredSchema)
  override def description(): String = {
    val f = filters.map(_.toString).sorted.mkString(", ")
    s"TickerScan PushedFilters: [$f], ReadSchema: ${requiredSchema.simpleString}"
  }

  /** Resolve the pushed filters into the pruned generation space. */
  private def surviving[A](all: Seq[A], col: String, show: A => String): Seq[A] =
    filters.foldLeft(all) {
      case (acc, EqualTo(`col`, v: String)) => acc.filter(show(_) == v)
      case (acc, In(`col`, vs)) =>
        val set = vs.collect { case s: String => s }.toSet
        acc.filter(a => set.contains(show(a)))
      case (acc, _) => acc
    }

  private def tickBounds: (Long, Long) = // [lo, hi)
    filters.foldLeft((0L, config.nTicks)) {
      case ((lo, hi), GreaterThan("tick", v: Long)) => (math.max(lo, v + 1), hi)
      case ((lo, hi), GreaterThanOrEqual("tick", v: Long)) => (math.max(lo, v), hi)
      case ((lo, hi), LessThan("tick", v: Long)) => (lo, math.min(hi, v))
      case ((lo, hi), LessThanOrEqual("tick", v: Long)) => (lo, math.min(hi, v + 1))
      case (b, _) => b
    }

  /** One partition per surviving (coin, exchange) pair — the natural
    * parallelism of the feed (reference: one REST call per pair). Pairs
    * pruned by pushed equality/IN filters never plan a partition at all. */
  override def planInputPartitions(): Array[InputPartition] = {
    val coins = surviving(config.coins, "coin_id", identity[String])
    val exchanges = surviving(config.exchanges, "exchange", identity[String])
    val (lo, hi) = tickBounds
    if (lo >= hi) Array.empty
    else (for (c <- coins; e <- exchanges)
      yield TickerPartition(c, e, lo, hi): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TickerReaderFactory(requiredSchema, config.startEpochSec,
      config.intervalSec)
}

case class TickerPartition(coin: String, exchange: String,
    tickLo: Long, tickHi: Long) extends InputPartition

/** Streaming form of the feed: the offset IS the tick index (exactly the
  * Kafka-offset shape of the reference's S1 source, without the broker).
  * Each micro-batch covers the tick range (start, end] split one
  * partition per (coin, exchange) pair; restart replays from the
  * checkpointed tick, giving exactly-once with a deterministic generator.
  * `maxTicksPerBatch` bounds admission so a cold start over a deep
  * backlog becomes several bounded batches, not one giant one. */
class TickerMicroBatchStream(config: TickerConfig, schema: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  // Trigger.AvailableNow: snapshot the drain target; admission control
  // (latestOffset(start, limit)) still paces the batches toward it —
  // without this interface the AvailableNow wrapper runs ONE unbounded
  // batch, defeating maxTicksPerBatch on a deep backlog.
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(config.nTicks)

  private case class TickOffset(tick: Long) extends Offset {
    override def json(): String = tick.toString
  }

  override def initialOffset(): Offset = TickOffset(0L)
  override def deserializeOffset(json: String): Offset =
    TickOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def latestOffset(): Offset = TickOffset(config.nTicks)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(
      config.maxTicksPerBatch * config.nCoins * config.nExchanges)

  /** Admission control: advance by at most `limit / pairs` ticks (every
    * tick fans out one row per (coin, exchange) pair). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[TickOffset].tick
    val maxTicks = limit match {
      case r: ReadMaxRows =>
        math.max(1L, r.maxRows() / (config.nCoins.toLong * config.nExchanges))
      case _ => config.nTicks
    }
    val target = availableNowTarget.getOrElse(config.nTicks)
    TickOffset(math.min(target, from + maxTicks))
  }
  override def reportLatestOffset(): Offset = TickOffset(config.nTicks)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[TickOffset].tick
    val hi = end.asInstanceOf[TickOffset].tick
    if (lo >= hi) Array.empty
    else (for (c <- config.coins; e <- config.exchanges)
      yield TickerPartition(c, e, lo, hi): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TickerReaderFactory(schema, config.startEpochSec, config.intervalSec)
}

class TickerReaderFactory(schema: StructType, startEpochSec: Long,
    intervalSec: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TickerPartition]
    new TickerReader(p, schema, startEpochSec, intervalSec)
  }
}

/** Row generator for one (coin, exchange) slice: only the pruned columns
  * are computed — with tick-only projections the md5 is skipped too. */
class TickerReader(p: TickerPartition, schema: StructType,
    startEpochSec: Long, intervalSec: Long)
    extends PartitionReader[InternalRow] {

  private var tick = p.tickLo - 1
  private val needsHash = schema.fieldNames.exists(
    n => n == "price_cents" || n == "volume_milli")
  private val coinUtf8 = UTF8String.fromString(p.coin)
  private val exchangeUtf8 = UTF8String.fromString(p.exchange)

  override def next(): Boolean = { tick += 1; tick < p.tickHi }

  override def get(): InternalRow = {
    val h = if (needsHash) Ticker.hash12(p.coin, p.exchange, tick) else 0L
    InternalRow.fromSeq(schema.fieldNames.toSeq.map {
      case "coin_id" => coinUtf8
      case "exchange" => exchangeUtf8
      case "tick" => tick
      case "ts" => (startEpochSec + tick * intervalSec) * 1000000L // µs
      case "price_cents" => Ticker.priceCents(h)
      case "volume_milli" => Ticker.volumeMilli(h)
    })
  }

  override def close(): Unit = ()
}
