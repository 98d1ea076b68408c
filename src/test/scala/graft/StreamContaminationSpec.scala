package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamContamination

class StreamContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("streaming screen flags exactly the docs sharing >=3 bench 5-grams") {
    implicit val sqlCtx = spark.sqlContext
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    // 8 tokens -> 4 distinct 5-grams in the bench set
    val bench = StreamContamination.benchShingles(
      spark, sf, n = 5, benchMax = 0L) ++ {
      val tmp = Seq((0L, benchText)).toDF("doc_id", "text")
      tmp.select(explode(graft.ops.Dedup.shingleArray(col("text"), 5)).as("s"))
        .as[String].collect().toSeq
    }
    val in = MemoryStream[(Long, String)]
    val q = StreamContamination.flagged(
        in.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("sc_out")
      .outputMode("append").start()
    try {
      in.addData(
        (10L, benchText + " iota"),                 // 4 shared 5-grams
        (11L, "alpha beta gamma delta epsilon x"),  // 1 shared (prefix only)
        (12L, "totally unrelated text with no overlap at all whatsoever"))
      q.processAllAvailable()
      in.addData(
        (13L, "zz " + benchText))                   // 4 shared, later batch
      q.processAllAvailable()
      val out = spark.table("sc_out").as[(Long, Long)].collect().toMap
      assert(out === Map(10L -> 4L, 13L -> 4L))
    } finally q.stop()
  }

  test("stream screen verdict matches the batch contamination sweep on testdata") {
    val bench = StreamContamination.benchShingles(spark, sf)
    val docs = graft.util.Tables.documents(spark, sf)
      .filter(col("doc_id") >= 10L).select("doc_id", "text")
    val streamShape = StreamContamination.flagged(docs, bench)
      .select("doc_id").as[Long].collect().toSet
    // batch sweep flags (train_doc, bench_doc) pairs with >=3 shared each;
    // any such doc shares >=3 with the set as a whole, so batch ⊆ stream
    val batch = graft.ops.Dedup.contamination(spark, sf)
      .select("train_doc").distinct().as[Long].collect().toSet
    assert(batch.subsetOf(streamShape))
    // and every stream-flagged doc really does share >=3 distinct bench grams
    val recheck = docs
      .withColumn("n", size(array_intersect(
        graft.ops.Dedup.shingleArray(col("text"), 5), typedLit(bench))))
      .filter(col("n") >= 3).select("doc_id").as[Long].collect().toSet
    assert(streamShape === recheck)
  }
}
