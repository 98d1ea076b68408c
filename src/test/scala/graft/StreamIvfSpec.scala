package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamIvf

/** Streaming IVF occupancy must equal the batch assignment over the
  * union of micro-batches, be micro-batch invariant, and agree with a
  * plain-Scala argmin replay (integer distances, lowest-id tiebreak). */
class StreamIvfSpec extends SparkSpec {
  import spark.implicits._

  private val d = 6
  private val cents: Seq[(Long, Seq[Long])] = Seq(
    0L -> Seq.tabulate(d)(i => (i * 20000 - 50000).toLong),
    1L -> Seq.tabulate(d)(i => (50000 - i * 20000).toLong),
    2L -> Seq.fill(d)(0L))
  private val rows: Seq[(Long, Seq[Float])] = (0 until 90).map { r =>
    (r.toLong, Seq.tabulate(d)(i => ((r * 11 + i * 5) % 17 - 8) / 10.0f))
  }

  private def streamCounts(splits: Seq[Seq[(Long, Seq[Float])]]): Map[Long, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamIvf.bucketCounts(
        in.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", $"embedding".cast("array<float>")), cents)
      .writeStream.format("memory").queryName("ivf_out")
      .outputMode("complete").start()
    try {
      splits.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table("ivf_out").as[(Long, Long)].collect().toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ivf_out")
    }
  }

  test("streaming occupancy equals a plain-Scala argmin and is split-invariant") {
    // independent replay with the same quantization and tiebreak
    val expect = rows
      .map { case (_, v) =>
        val q = v.map(x => math.round(x.toDouble * 100000))
        cents.map { case (id, cv) =>
          (q.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, id)
        }.min._2
      }
      .groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
    val one = streamCounts(Seq(rows))
    val three = streamCounts(Seq(rows.take(31), rows.slice(31, 32), rows.drop(32)))
    assert(one === expect)
    assert(three === expect)
    assert(expect.values.sum === 90L)
    assert(expect.keySet.size > 1, "degenerate centroid set: all one bucket")
  }
}
