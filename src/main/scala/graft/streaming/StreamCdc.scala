package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming face of the batch CDC apply (`ops/Cdc.cdcMerge`): a
  * continuously-maintained keyed snapshot with tombstones, on the
  * `transformWithState` v2 state API.
  *
  * Each key holds ONE `ValueState` cell — the current (value, deleted,
  * version) — so state is O(keys), independent of log length. Deletes
  * keep a tombstone (deleted=true) instead of clearing state: the
  * version counter must survive so a later insert resurrects the key
  * with a strictly increasing version, which is what lets a downstream
  * consumer order snapshot emissions without timestamps.
  *
  * Ordering contract: ops are applied in (ts_us, event_id) order WITHIN
  * a micro-batch (the iterator is sorted per key; bounded by the batch,
  * not history) and in arrival order across batches — the usual CDC
  * assumption of a key-partitioned, in-order upstream (Kafka keyed by
  * the primary key). StreamCdcSpec asserts batch-split invariance and
  * equality with the batch latest-op-wins replay.
  */
object StreamCdc {

  final case class CdcOp(user_id: Long, op: String, cents: Long,
      ts_us: Long, event_id: Long)

  final case class SnapshotRow(user_id: Long, cents: Long,
      deleted: Boolean, version: Long)

  class CdcSnapshotProcessor
      extends StatefulProcessor[Long, CdcOp, SnapshotRow] {
    @transient private var st: ValueState[SnapshotRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SnapshotRow]("snap",
        Encoders.product[SnapshotRow], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcOp],
        timerValues: TimerValues): Iterator[SnapshotRow] = {
      var cur = Option(st.get())
        .getOrElse(SnapshotRow(key, 0L, deleted = true, 0L))
      rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
        cur =
          if (r.op == "D") SnapshotRow(key, 0L, deleted = true, cur.version + 1)
          else SnapshotRow(key, r.cents, deleted = false, cur.version + 1)
      }
      st.update(cur)
      Iterator.single(cur)
    }
  }

  /** Attach to a (streaming or batch) op Dataset; emits the key's
    * post-batch snapshot row each micro-batch it is touched. */
  def attach(ops: Dataset[CdcOp]): Dataset[SnapshotRow] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.user_id)
      .transformWithState(new CdcSnapshotProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming replay gate, oracle-gated as q_cdc_replay (the
    * q_mv_replay pattern applied to the CDC family): the op log of a
    * bounded, deterministic user slice (user_id % 7 == 0 — the slice
    * keeps the driver-side MemoryStream feed bounded at ANY scale
    * factor while exercising insert/update/delete/resurrect on real
    * keys) is split into 5 contiguous micro-batches in (ts_us,
    * event_id) order and driven through the REAL
    * `transformWithState` query — RocksDB store, update mode, state
    * carried across batches. The final (max-version) snapshot per key
    * must equal DuckDB's relational latest-op-wins replay of the same
    * slice, which is exactly the invariant the batch face can't test:
    * that per-key state survives and composes across micro-batch
    * boundaries. */
  def replayGate(parent: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val spark = parent.newSession()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.streams.active
    val opLog = graft.util.Tables.events(spark, dir)
      .filter(pmod(col("user_id"), lit(7)) === 0)
      .select(col("user_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D").otherwise("U").as("op"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .as[CdcOp].collect().toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdcOp]
    val sinkName = s"cdc_replay_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = attach(mem.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start()
    val nBatches = 5
    try {
      val per = math.max(1, (opLog.length + nBatches - 1) / nBatches)
      opLog.grouped(per).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("version").desc)
    spark.table(sinkName)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("n_batches", lit(nBatches.toLong))
      .orderBy(col("user_id"))
  }

  /** Batch face, oracle-gated as q_stream_cdc: the whole event log is
    * one "micro-batch", so the processor's sorted per-key fold must
    * equal the relational latest-op-wins replay (the DuckDB oracle).
    * Session forked + RocksDB pinned exactly like `StateV2.tickerPartials`
    * — the v2 state API only runs on the RocksDB store. */
  def snapshotBatch(parent: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val spark = parent.newSession()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.streams.active // force the StateStoreCoordinator endpoint
    val ops = graft.util.Tables.events(spark, dir)
      .select(col("user_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D").otherwise("U").as("op"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[CdcOp]
    attach(ops).toDF().orderBy(col("user_id"))
  }
}
