package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.streaming.StreamQuantile

/** The streaming quantile-sketch cells must be batch-split invariant and
  * equal the batch histogram over the union — the additive-merge
  * property that makes the sketch a per-shard latency summary — and the
  * cell space must stay bounded regardless of how many values arrive. */
class StreamQuantileSpec extends SparkSpec {
  import spark.implicits._

  // values straddle several octaves and sub-buckets, with repeats so
  // counts exceed 1, plus a sub-cent value the c >= 1 filter must drop
  private val events: Seq[(String, Double)] = Seq(
    "view" -> 0.37, "view" -> 0.37, "view" -> 1.02, "view" -> 7.5,
    "view" -> 63.99, "view" -> 64.0, "view" -> 250.0,
    "buy" -> 3.14, "buy" -> 3.15, "buy" -> 12.0, "buy" -> 12.0,
    "buy" -> 1023.99, "buy" -> 0.004)

  private def streamCells(
      splits: Seq[Seq[(String, Double)]]): Map[(String, Long), (Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val q = StreamQuantile.cells(in.toDF().toDF("event_type", "value"))
      .select("event_type", "bucket", "cnt", "lo_cents", "hi_cents")
      .writeStream.format("memory").queryName("qs_out")
      .outputMode("complete").start()
    try {
      splits.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table("qs_out").as[(String, Long, Long, Long, Long)].collect()
        .map { case (t, b, c, lo, hi) => (t, b) -> (c, lo, hi) }.toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS qs_out")
    }
  }

  test("streaming cells equal the batch sketch and are batch-split invariant") {
    val batch = Analytics.sketchCells(
        events.toDF("event_type", "value")
          .select($"event_type", round($"value" * 100).cast("long").as("c"))
          .filter($"c" >= 1))
      .select("event_type", "bucket", "cnt", "lo_cents", "hi_cents")
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (t, b, c, lo, hi) => (t, b) -> (c, lo, hi) }.toMap
    val oneBatch = streamCells(Seq(events))
    val threeBatches = streamCells(
      Seq(events.take(4), events.slice(4, 9), events.drop(9)))
    assert(oneBatch === batch)
    assert(threeBatches === batch)
    // the sub-cent value must not have produced a cell
    assert(batch.values.map(_._1).sum === events.size - 1)
    // every cell's bounds really bracket at least one planted value
    val cents = events.map { case (t, v) => t -> math.round(v * 100) }
    batch.foreach { case ((t, _), (_, lo, hi)) =>
      assert(cents.exists { case (tt, c) => tt == t && c >= lo && c <= hi },
        s"cell [$lo,$hi] of $t brackets no planted value")
    }
  }

  test("cell space is bounded by the fixed key space, not the stream") {
    // 2000 distinct values into one event_type: cells stay <= 64*sub
    val many = (1 to 2000).map(i => "x" -> i * 0.37)
    val out = streamCells(Seq(many.take(1000), many.drop(1000)))
    assert(out.size <= 64 * 8, s"${out.size} cells for one event_type")
    assert(out.values.map(_._1).sum === many.size.toLong)
  }
}
