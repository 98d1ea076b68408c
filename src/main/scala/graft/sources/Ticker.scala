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

  /** Per-(coin, exchange) tick census over a tick window — every
    * aggregate here has a closed form over the tick range, so the whole
    * query runs through the pushed-aggregation path: each of the 40
    * surviving partitions emits ONE arithmetic row and no tick is ever
    * generated (TickerSourceSpec asserts the PushedAggregation marker).
    * `unix_micros` applies AFTER the aggregate — wrapping `ts` inside
    * `max()` would make the aggregate an expression, not a column
    * reference, and silently forfeit the pushdown. */
  def aggCensus(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.Ticker").load()
      .filter(col("exchange").isin("ex0", "ex1") &&
              col("tick") >= 100L && col("tick") < 400L)
      .groupBy(col("coin_id"), col("exchange"))
      .agg(
        count(lit(1)).as("n_ticks"),
        min(col("tick")).as("first_tick"),
        max(col("tick")).as("last_tick"),
        max(col("ts")).as("last_ts"))
      .select(col("coin_id"), col("exchange"), col("n_ticks"),
        col("first_tick"), col("last_tick"),
        unix_micros(col("last_ts")).as("last_ts_us"))
      .orderBy(col("coin_id"), col("exchange"))
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

/** Scan builder accumulating pruned columns, pushed filters, and (round
  * 6) pushed limit / top-N / aggregation — the remaining DSv2 pushdown
  * axes. Per-partition tick generation is strictly ascending and each
  * partition is a single (coin, exchange) pair, which is what makes the
  * deeper pushdowns sound:
  *   - **limit** caps the generated tick range per partition (partial —
  *     Spark still applies the global limit on top);
  *   - **top-N** on `tick` or `ts` (both strictly increasing in tick)
  *     keeps only the first/last N ticks of each partition's range;
  *   - **aggregation** (COUNT(*)/COUNT(col)/MIN/MAX over grouping by
  *     per-partition-constant columns) collapses each partition to ONE
  *     closed-form row — a per-pair tick census over a billion-tick feed
  *     generates zero data rows. Partial pushdown: Spark's final
  *     aggregate merges the per-partition partials, so correctness never
  *     depends on the source seeing every group in one partition. */
class TickerScanBuilder(config: TickerConfig)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}

  private var requiredSchema: StructType = Ticker.Schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Option[Long] = None
  private var topNDesc: Boolean = false
  private var pushedAgg: Option[Aggregation] = None

  /** With an aggregation pushed the scan's output schema IS the
    * aggregate schema — the pre-aggregation column set no longer
    * applies, so pruning is a no-op then. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (pushedAgg.isEmpty) this.requiredSchema = requiredSchema

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

  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.nonEmpty) false
    else { pushedLimit = Some(limit.toLong); true }
  }
  // both the limit and the top-N stay partial: Spark keeps its own
  // Limit/TakeOrdered on top, the source just generates fewer rows
  override def isPartiallyPushed(): Boolean = true

  private def singleName(e: V2Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      Some(r.fieldNames()(0))
    case _ => None
  }

  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean =
    (pushedAgg.isEmpty, orders) match {
      case (true, Array(o)) if singleName(o.expression)
          .exists(n => n == "tick" || n == "ts") =>
        // ts = start + tick·interval is strictly increasing in tick, so
        // either ordering is the tick ordering the generator already has
        topNDesc = o.direction == SortDirection.DESCENDING
        pushedLimit = Some(limit.toLong)
        true
      case _ => false
    }

  override def pushAggregation(agg: Aggregation): Boolean = {
    val constCols = Set("coin_id", "exchange")
    val closedForm = Set("tick", "ts", "coin_id", "exchange")
    val groupsOk = agg.groupByExpressions.forall(
      singleName(_).exists(constCols))
    val aggsOk = agg.aggregateExpressions.forall {
      case _: CountStar => true
      // no column is ever null → COUNT(col) ≡ COUNT(*)
      case c: Count => !c.isDistinct && singleName(c.column).isDefined
      case m: Min => singleName(m.column).exists(closedForm)
      case m: Max => singleName(m.column).exists(closedForm)
      case _ => false // SUM(price_cents) etc. need the per-tick hash
    }
    if (groupsOk && aggsOk && pushedLimit.isEmpty) {
      pushedAgg = Some(agg); true
    } else false
  }

  override def build(): Scan = new TickerScan(config, requiredSchema, pushed,
    pushedLimit, topNDesc, pushedAgg)
}

class TickerScan(config: TickerConfig, requiredSchema: StructType,
    filters: Array[Filter],
    pushedLimit: Option[Long] = None, topNDesc: Boolean = false,
    pushedAgg: Option[org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None)
    extends Scan with Batch with SupportsRuntimeFiltering {
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}

  /** Runtime (DPP-style) filtering: joining the feed against a selective
    * dimension on coin_id/exchange lets Spark execute the dimension
    * first and hand the surviving join keys back here BEFORE partitions
    * materialize — the DSv2 twin of dynamic partition pruning. The
    * runtime IN-lists land in the same `surviving` pruning as the static
    * pushdown, so a 2-coin dimension prunes 18 of 180 pairs at
    * EXECUTION time with zero tick generation for the rest. */
  private var runtimeFilters: Array[Filter] = Array.empty
  // only columns present in the scan OUTPUT qualify — naming a pruned
  // column fails attribute resolution against the scan relation
  override def filterAttributes(): Array[NamedReference] =
    readSchema().fieldNames
      .filter(n => n == "coin_id" || n == "exchange")
      .map(Expressions.column)
  override def filter(runtime: Array[Filter]): Unit =
    runtimeFilters = runtime

  private def singleName(e: V2Expression): String =
    e.asInstanceOf[NamedReference].fieldNames()(0)

  /** Post-aggregation schema: group columns then one field per aggregate
    * (Spark maps them positionally; names are cosmetic). */
  private def aggSchema: StructType = pushedAgg match {
    case None => requiredSchema
    case Some(agg) =>
      val g = agg.groupByExpressions.map(e => Ticker.Schema(singleName(e)))
      val a = agg.aggregateExpressions.zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"count_$i", LongType, nullable = false)
        case (_: Count, i) => StructField(s"count_$i", LongType, nullable = false)
        case (m: Min, i) =>
          StructField(s"min_$i", Ticker.Schema(singleName(m.column)).dataType, nullable = false)
        case (m: Max, i) =>
          StructField(s"max_$i", Ticker.Schema(singleName(m.column)).dataType, nullable = false)
        case (f, _) => throw new IllegalStateException(s"unsupported pushed agg $f")
      }
      StructType(g ++ a)
  }

  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TickerMicroBatchStream(config, requiredSchema)
  override def description(): String = {
    val f = filters.map(_.toString).sorted.mkString(", ")
    val lim = pushedLimit.map(l =>
      s", PushedLimit: $l${if (topNDesc) " (last ticks)" else ""}").getOrElse("")
    val ag = pushedAgg.map(a =>
      s", PushedAggregation: [${a.aggregateExpressions.mkString(", ")}]" +
      s" GroupBy: [${a.groupByExpressions.mkString(", ")}]").getOrElse("")
    s"TickerScan PushedFilters: [$f]$lim$ag, ReadSchema: ${readSchema().simpleString}"
  }

  /** Resolve the pushed + runtime filters into the pruned generation
    * space. */
  private def surviving[A](all: Seq[A], col: String, show: A => String): Seq[A] =
    (filters ++ runtimeFilters).foldLeft(all) {
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
    val (lo0, hi0) = tickBounds
    // a pushed limit/top-N narrows every partition's generated range to
    // its first (asc) or last (desc) N ticks; Spark's own Limit /
    // TakeOrdered merges across partitions
    val (lo, hi) = pushedLimit match {
      case Some(l) if topNDesc => (math.max(lo0, hi0 - l), hi0)
      case Some(l) => (lo0, math.min(hi0, lo0 + l))
      case None => (lo0, hi0)
    }
    if (lo >= hi) Array.empty
    else (for (c <- coins; e <- exchanges)
      yield TickerPartition(c, e, lo, hi): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = pushedAgg match {
    case Some(agg) =>
      // pre-resolve each output field into a closed-form spec the reader
      // evaluates per partition without generating any tick rows
      val groups = agg.groupByExpressions.map(singleName).toSeq
      val aggs = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => ("count", "")
        case c: Count => ("count", "")
        case m: Min => ("min", singleName(m.column))
        case m: Max => ("max", singleName(m.column))
        case f => throw new IllegalStateException(s"unsupported pushed agg $f")
      }
      new TickerAggReaderFactory(groups, aggs, config.startEpochSec,
        config.intervalSec)
    case None =>
      new TickerReaderFactory(requiredSchema, config.startEpochSec,
        config.intervalSec)
  }
}

/** One closed-form partial-aggregate row per (coin, exchange) partition:
  * counts and tick/ts extrema follow from the tick range arithmetically;
  * group columns are partition constants. Spark's final aggregate merges
  * these partials exactly as it would merge per-partition hash-agg
  * output — the scan just skipped materializing the rows. */
class TickerAggReaderFactory(groups: Seq[String], aggs: Seq[(String, String)],
    startEpochSec: Long, intervalSec: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TickerPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted || p.tickLo >= p.tickHi) false
        else { emitted = true; true }
      private def colValue(name: String, tick: Long): Any = name match {
        case "coin_id" => UTF8String.fromString(p.coin)
        case "exchange" => UTF8String.fromString(p.exchange)
        case "tick" => tick
        case "ts" => (startEpochSec + tick * intervalSec) * 1000000L
      }
      override def get(): InternalRow = {
        val g = groups.map(colValue(_, p.tickLo))
        val a = aggs.map {
          case ("count", _) => p.tickHi - p.tickLo
          case ("min", c) => colValue(c, p.tickLo)
          case ("max", c) => colValue(c, p.tickHi - 1)
        }
        InternalRow.fromSeq(g ++ a)
      }
      override def close(): Unit = ()
    }
  }
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
