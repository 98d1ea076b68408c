package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.streaming.StreamSketch

/** The streaming count-min cells must be batch-split invariant and
  * equal the batch sketch over the union — the additive-merge property
  * that makes the sketch a per-shard summary. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "spark shuffles the sorted runs into merged partitions",
    "the sorted runs spill when the partitions outgrow memory",
    "merged partitions feed the sorted aggregate",
    "a count min sketch keeps additive cells per shard",
    "additive cells merge by addition never by rescan")

  private def streamCells(splits: Seq[Seq[String]]): Map[(Long, Long), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamSketch.cells(in.toDF().toDF("text"))
      .writeStream.format("memory").queryName("cm_out")
      .outputMode("complete").start()
    try {
      splits.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table("cm_out").as[(Long, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cm_out")
    }
  }

  test("streaming cells equal the batch sketch and are batch-split invariant") {
    val batch = TextAnalysis.cmCells(
        docs.toDF("text").select(explode(TextAnalysis.bigramTerms(col("text"))).as("term")),
        d = 4, w = 64)
      .as[(Long, Long, Long)].collect()
      .map { case (r, b, c) => (r, b) -> c }.toMap
    val oneBatch = streamCells(Seq(docs))
    val threeBatches = streamCells(Seq(docs.take(2), docs.slice(2, 4), docs.drop(4)))
    assert(oneBatch === batch)
    assert(threeBatches === batch)
  }
}
