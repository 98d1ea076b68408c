package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures runs partition-local and matches the metadata view") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length === 500)
    val meta = Multimodal.mediaMeta(spark, sf)
      .select("doc_id", "byte_len", "checksum")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    feats.foreach { f =>
      val (len, sum) = meta(f.doc_id)
      assert(f.byte_len === len)
      assert(f.checksum === sum)
    }
  }

  test("frameSample emits ceil-ish frame counts and binary windows") {
    val out = Multimodal.frameSample(spark, sf, frameBytes = 64, stride = 128)
    val counts = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val lens = Multimodal.mediaTable(spark, sf)
      .selectExpr("doc_id", "octet_length(payload) AS l").as[(Long, Int)]
      .collect().toMap
    counts.foreach { case (id, n) =>
      assert(n === math.max(lens(id) / 128, 1), s"doc $id")
    }
  }
}
