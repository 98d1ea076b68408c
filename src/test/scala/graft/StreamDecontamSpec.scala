package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Live span-level decontamination: a streaming train feed censused
  * against the broadcast benchmark must converge to the batch
  * decontamLongSpans output regardless of micro-batch splits — the
  * monitor a training-data pipeline runs while new crawl lands. */
class StreamDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def docsFrame = graft.util.Tables.documents(spark, sf)
    .select($"doc_id", split($"text", " ").as("t"))
    .withColumn("n", size($"t"))

  test("streamed per-doc span census equals the batch pass, split-invariant") {
    val bench = docsFrame.filter($"doc_id" < 100L)
    val train = docsFrame.filter($"doc_id" >= 100L)
    val expect = Dedup.decontamLongSpans(train, bench)
      .as[(Long, Long)].collect().toMap
    assert(expect.nonEmpty, "fixture must contain >=8-token contamination")

    val rows = train.select($"doc_id", $"t").as[(Long, Seq[String])]
      .collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[String])]
    val streamTrain = in.toDF().toDF("doc_id", "t").withColumn("n", size($"t"))
    val q = Dedup.decontamLongSpans(streamTrain, bench)
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode("complete").start()
    val live = try {
      // three uneven micro-batches: arrival order must not matter
      in.addData(rows.take(50)); q.processAllAvailable()
      in.addData(rows.slice(50, 51)); q.processAllAvailable()
      in.addData(rows.drop(51)); q.processAllAvailable()
      spark.table("decontam_out").as[(Long, Long)].collect().toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS decontam_out")
    }
    assert(live === expect)
  }
}
