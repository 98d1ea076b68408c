package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.StreamCdc
import graft.streaming.StreamCdc.{CdcOp, SnapshotRow}
import graft.util.Tables

class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  /** The fixture event log as an op sequence (same mapping as ops/Cdc). */
  private lazy val opLog: Seq[CdcOp] = Tables.events(spark, sf)
    .select($"user_id",
      when($"event_type" === "signup", "I")
        .when($"event_type" === "error", "D").otherwise("U").as("op"),
      round($"value" * 100).cast("long").as("cents"),
      unix_micros($"ts").as("ts_us"), $"event_id")
    .orderBy($"ts_us", $"event_id")
    .as[CdcOp].collect().toSeq

  /** Batch ground truth: latest-op-wins replay over the whole log. */
  private lazy val expected: Map[Long, SnapshotRow] = {
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    opLog.toDS()
      .withColumn("rn", row_number().over(w))
      .withColumn("version", count(lit(1)).over(Window.partitionBy($"user_id")))
      .filter($"rn" === 1)
      .select($"user_id",
        when($"op" === "D", 0L).otherwise($"cents").as("cents"),
        ($"op" === "D").as("deleted"), $"version")
      .as[SnapshotRow].collect()
      .map(r => r.user_id -> r).toMap
  }

  private def runSplit(chunks: Seq[Seq[CdcOp]], name: String): Map[Long, SnapshotRow] = {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[CdcOp]
    val q = StreamCdc.attach(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[SnapshotRow].collect()
        .groupBy(_.user_id).map { case (k, rs) => k -> rs.maxBy(_.version) }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming snapshot equals the batch latest-op-wins replay") {
    val n = opLog.length
    val finals = runSplit(
      Seq(opLog.take(n / 3), opLog.slice(n / 3, 2 * n / 3), opLog.drop(2 * n / 3)),
      "cdc_out_3")
    assert(finals === expected)
    // the fixture exercises both paths
    assert(expected.values.exists(_.deleted))
    assert(expected.values.exists(!_.deleted))
  }

  test("snapshot is invariant to micro-batch granularity") {
    val n = opLog.length
    val a = runSplit(Seq(opLog), "cdc_out_one")
    val b = runSplit(opLog.grouped(math.max(1, n / 7)).toSeq, "cdc_out_7")
    assert(a === b)
  }

  test("delete → insert resurrects with increasing version") {
    val ops = Seq(
      CdcOp(9L, "I", 100L, 1L, 1L),
      CdcOp(9L, "D", 0L, 2L, 2L),
      CdcOp(9L, "I", 250L, 3L, 3L))
    val out = runSplit(Seq(ops.take(2), ops.drop(2)), "cdc_out_res")
    assert(out(9L) === SnapshotRow(9L, 250L, deleted = false, 3L))
  }
}
