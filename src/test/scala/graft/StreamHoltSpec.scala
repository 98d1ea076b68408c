package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.indicators.Holt
import graft.streaming.StreamHolt
import graft.streaming.StreamHolt.{HoltRow, Obs}

/** The streaming Holt fold must equal the batch window function
  * bit-for-bit and be micro-batch-split invariant. */
class StreamHoltSpec extends SparkSpec {
  import spark.implicits._

  private val obs = Seq(
    Obs("k1", 1, 10.0), Obs("k1", 2, 14.0), Obs("k1", 3, 12.0),
    Obs("k1", 4, 20.0), Obs("k1", 5, 16.0),
    Obs("k2", 1, 5.0), Obs("k2", 2, 9.0), Obs("k2", 3, 7.5))

  private def run(splits: Seq[Seq[Obs]], name: String): Seq[HoltRow] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = StreamHolt.attach(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      splits.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[HoltRow].collect().toSeq
        .sortBy(r => (r.key, r.seq_no))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("streaming fold equals the batch window function bit-for-bit") {
    val batch = obs.toDS()
      .withColumn("h", Holt(spark, $"x", 0.5, 0.3).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy($"seq_no")))
      .select($"key", $"seq_no", $"h.level", $"h.trend",
        ($"h.level" + $"h.trend").as("forecast"))
      .as[HoltRow].collect().toSeq.sortBy(r => (r.key, r.seq_no))
    val streamed = run(Seq(obs), "sh_one")
    assert(streamed === batch) // exact double equality — same op order
  }

  test("micro-batch split does not change any emitted row") {
    val one = run(Seq(obs), "sh_a")
    val three = run(Seq(obs.take(3), obs.slice(3, 6), obs.drop(6)), "sh_b")
    assert(three === one)
  }

  test("in-batch disorder is repaired by the seq_no sort") {
    val shuffled = Seq(obs(4), obs(0), obs(2), obs(1), obs(3)) ++ obs.drop(5)
    val sortedRun = run(Seq(obs), "sh_c")
    val shuffledRun = run(Seq(shuffled), "sh_d")
    assert(shuffledRun === sortedRun)
  }
}
