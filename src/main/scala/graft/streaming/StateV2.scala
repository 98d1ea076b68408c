package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import graft.model.Schemas.PriceTick

/** Arbitrary stateful processing on the Spark 4 `transformWithState`
  * API — the successor of `flatMapGroupsWithState` (which
  * [[StatefulIndicators]] keeps for the indicator engine): typed named
  * state cells (`ValueState`/`ListState`/`MapState`) instead of one
  * opaque state object, per-cell TTL, timers, and schema evolution of
  * state across restarts.
  *
  * The op here is the streaming face of the decomposable-partial algebra
  * that `q_incremental_agg` / [[StreamingMV]] use in batch: each coin
  * carries ONE `ValueState` cell holding (n, Σcents, min, max) — O(1)
  * per key, independent of history — and every micro-batch emits the
  * key's updated partial. Integer cents make the fold order-independent
  * within a batch and bit-identical to the batch aggregation (asserted
  * in StateV2Spec across micro-batch splits).
  *
  * Runtime requirement: the v2 state API runs only on the RocksDB state
  * store (`spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`, rocksdbjni ships with Spark) —
  * the HDFS-backed default store does not implement it. At scale that is
  * the store you want anyway: state lives off-heap with incremental
  * checkpointing, so per-executor state size is bounded by disk, not
  * executor memory.
  */
object StateV2 {

  /** Decomposable per-coin tick partial (integer cents). */
  final case class TickPartial(coin_id: String, n: Long, sum_cents: Long,
      min_cents: Long, max_cents: Long)

  /** One ValueState cell per key; emits the merged partial per batch. */
  class TickStatsProcessor
      extends StatefulProcessor[String, PriceTick, TickPartial] {
    @transient private var st: ValueState[TickPartial] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TickPartial]("partial",
        Encoders.product[TickPartial], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PriceTick],
        timerValues: TimerValues): Iterator[TickPartial] = {
      var cur = Option(st.get())
        .getOrElse(TickPartial(key, 0L, 0L, Long.MaxValue, Long.MinValue))
      rows.foreach { t =>
        val c = math.round(t.price * 100)
        cur = TickPartial(key, cur.n + 1, cur.sum_cents + c,
          math.min(cur.min_cents, c), math.max(cur.max_cents, c))
      }
      st.update(cur)
      Iterator.single(cur)
    }
  }

  /** Attach to a (streaming or batch) tick Dataset. */
  def attach(ticks: Dataset[PriceTick]): Dataset[TickPartial] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.coin_id)
      .transformWithState(new TickStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
