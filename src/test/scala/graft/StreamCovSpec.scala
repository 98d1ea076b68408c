package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamCov

/** The streaming covariance buffer must equal the batch aggregate over
  * the union of micro-batches and be batch-split invariant — the
  * associative-merge property that lets 1000 executors (or 1000
  * micro-batches) fold partials in any order. */
class StreamCovSpec extends SparkSpec {
  import spark.implicits._

  private val d = 4
  private val rows: Seq[(Long, Seq[Float])] = (0 until 60).map { r =>
    (r.toLong, Seq.tabulate(d)(i => ((r * 13 + i * 7) % 19 - 9) / 20.0f))
  }

  private def streamPacked(splits: Seq[Seq[(Long, Seq[Float])]]): Map[Int, Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamCov.packed(
        in.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", $"embedding".cast("array<float>")), d)
      .writeStream.format("memory").queryName("cov_out")
      .outputMode("complete").start()
    try {
      splits.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table("cov_out").as[(Int, Seq[Long])].collect().toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cov_out")
    }
  }

  test("streaming packed covariance equals batch and is micro-batch invariant") {
    val batch = StreamCov.packed(
        rows.toDF("vec_id", "embedding")
          .withColumn("embedding", $"embedding".cast("array<float>")), d)
      .as[(Int, Seq[Long])].collect().toMap
    assert(batch.keySet === Set(0, 1))
    assert(batch(0).head === 30L) // n per parity split
    val oneBatch = streamPacked(Seq(rows))
    val fourBatches = streamPacked(
      Seq(rows.take(7), rows.slice(7, 20), rows.slice(20, 21), rows.drop(21)))
    assert(oneBatch === batch)
    assert(fourBatches === batch)
  }

  test("crash-replay: covariance state resumes from checkpoint, no double-fold") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("cov_ck").toString
    val in = MemoryStream[(Long, Seq[Float])]
    def start(name: String) = StreamCov.packed(
        in.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", $"embedding".cast("array<float>")), d)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = start("cov_r1")
    try { in.addData(rows.take(25)); q1.processAllAvailable() }
    finally q1.stop() // "crash" between micro-batches
    in.addData(rows.drop(25)) // arrives while the query is down
    val q2 = start("cov_r2")
    try {
      q2.processAllAvailable()
      val got = spark.table("cov_r2").as[(Int, Seq[Long])].collect().toMap
      val batch = StreamCov.packed(
          rows.toDF("vec_id", "embedding")
            .withColumn("embedding", $"embedding".cast("array<float>")), d)
        .as[(Int, Seq[Long])].collect().toMap
      // resumed state + new rows == batch over the union: batch-1 rows
      // folded exactly once despite the restart
      assert(got === batch)
    } finally {
      q2.stop()
      spark.sql("DROP TABLE IF EXISTS cov_r1")
      spark.sql("DROP TABLE IF EXISTS cov_r2")
    }
  }
}
