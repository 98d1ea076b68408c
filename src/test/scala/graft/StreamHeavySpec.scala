package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamHeavy

/** The continuously-maintained Misra-Gries state must keep its size cap
  * and undercount guarantee after every micro-batch, under any batch
  * split — the mergeable-summary property in streaming form. */
class StreamHeavySpec extends SparkSpec {
  import spark.implicits._

  // 60xa, 30xb, 24 singletons: a and b exceed N/(k+1) = 114/5 for k=4
  private val keys: Seq[String] =
    Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ (0 until 24).map(i => s"t$i")

  private def streamSummary(splits: Seq[Seq[String]], k: Int): Map[String, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamHeavy.summary(in.toDF().toDF("key"), k)
      .writeStream.format("memory").queryName("mg_out")
      .outputMode("complete").start()
    try {
      splits.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table("mg_out").as[Map[String, Long]].head()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS mg_out")
    }
  }

  test("streaming summary keeps the MG guarantees under any batch split") {
    val exact = keys.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val n = keys.size.toLong
    val k = 4
    val splits = Seq(
      Seq(keys),                                        // one batch
      Seq(keys.take(40), keys.slice(40, 80), keys.drop(80))) // three batches
    splits.foreach { sp =>
      val m = streamSummary(sp, k)
      assert(m.size <= k)
      assert(m.contains("a") && m.contains("b"),
        s"heavy keys lost in ${sp.length}-batch split: $m")
      exact.foreach { case (t, cnt) =>
        val est = m.getOrElse(t, 0L)
        assert(est <= cnt)
        assert((cnt - est) * (k + 1) <= n,
          s"bound broken for $t in ${sp.length}-batch split: cnt=$cnt est=$est")
      }
    }
  }
}
