package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamQuota
import graft.streaming.StreamQuota.{Decision, DocRef}

/** Per-domain streaming admission: the admitted COUNT per domain must be
  * min(total, cap) under any micro-batch split, each admitted doc is
  * decided exactly once, and the counter state carries across batches. */
class StreamQuotaSpec extends SparkSpec {
  import spark.implicits._

  // three domains: one far over cap, one exactly at cap, one under
  private val docs: Seq[DocRef] =
    (1L to 10L).map(i => DocRef("a.com", i)) ++
      (11L to 13L).map(i => DocRef("b.org", i)) ++
      (14L to 15L).map(i => DocRef("c.net", i))

  private def run(splits: Seq[Seq[DocRef]], cap: Long): Seq[Decision] = {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[DocRef]
    val q = StreamQuota.decisions(mem.toDS(), cap)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      splits.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("quota_out").as[Decision].collect().toSeq
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS quota_out")
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("admitted counts are min(total, cap) under any batch split") {
    val cap = 3L
    val splits = Seq(
      Seq(docs),                                    // one batch
      Seq(docs.take(4), docs.slice(4, 12), docs.drop(12))) // state must carry
    splits.foreach { sp =>
      val out = run(sp, cap)
      assert(out.length == docs.length, "every doc gets exactly one decision")
      assert(out.map(d => (d.domain, d.doc_id)).distinct.length == docs.length)
      val admitted = out.filter(_.admitted).groupBy(_.domain).view.mapValues(_.size).toMap
      assert(admitted == Map("a.com" -> 3, "b.org" -> 3, "c.net" -> 2),
        s"split=${sp.length}: $admitted")
    }
  }

  test("batch-mode decisions agree with Web.domainCap kept counts") {
    // run the SAME processor in batch mode over the derived domain frame
    // and compare per-domain admitted counts with the batch quota gate
    val sfDocs = graft.ops.Web.domainCap(spark, sf, cap = 3).collect()
      .map(r => r.getAs[String]("registered_domain") -> r.getAs[Long]("n_kept")).toMap
    val frame = graft.ops.Web.urlCanon(spark, sf)
      .select(org.apache.spark.sql.functions.col("host"),
        org.apache.spark.sql.functions.col("doc_id"))
      .collect()
      .map { r =>
        val host = r.getAs[String]("host")
        val labels = host.split('.')
        val last2 = labels.takeRight(2).mkString(".")
        val dom = if (last2 == "co.uk" || last2 == "com.au")
          labels.takeRight(3).mkString(".") else last2
        DocRef(dom, r.getAs[Long]("doc_id"))
      }.toSeq
    val out = run(Seq(frame), 3L)
    val admitted = out.filter(_.admitted).groupBy(_.domain).view.mapValues(_.size.toLong).toMap
    assert(admitted == sfDocs,
      "streaming first-cap admission count must equal batch best-cap kept count")
  }
}
