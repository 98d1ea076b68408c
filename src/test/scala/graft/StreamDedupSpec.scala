package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, min: Int, text: String) =
    (id, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), text)

  test("streaming LSH dedup admits first occurrences only, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = StreamDedup.firstOccurrences(
        in.toDF().toDF("doc_id", "ts", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    try {
      in.addData(
        doc(0, 1, "the quick brown fox jumps over the lazy dog"),
        doc(1, 2, "spark structured streaming bounds dedup state by watermark"),
        doc(2, 3, "the quick brown fox jumps over the lazy dog")) // in-batch dup
      q.processAllAvailable()
      in.addData(
        doc(3, 5, "the quick brown fox jumps over the lazy dog"), // cross-batch dup
        doc(4, 6, "a genuinely different document arrives and passes"))
      q.processAllAvailable()
      val admitted = spark.table("sd_out").as[Long].collect().toSet
      assert(admitted === Set(0L, 1L, 4L))
    } finally q.stop()
  }

  test("short docs (no shingle) are filtered, not collided into one bucket") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = StreamDedup.firstOccurrences(in.toDF().toDF("doc_id", "ts", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("sd_short")
      .outputMode("append").start()
    try {
      in.addData(doc(0, 1, "too short"), doc(1, 2, "also tiny"),
        doc(2, 3, "this one is long enough to shingle"))
      q.processAllAvailable()
      assert(spark.table("sd_short").as[Long].collect().toSet === Set(2L))
    } finally q.stop()
  }

  test("batch mode: one survivor per band key, consistent with the stream") {
    val docs = graft.util.Tables.documents(spark, sf)
      .withColumn("ts", lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    val out = StreamDedup.firstOccurrences(docs)
    val nBands = docs.select(StreamDedup.bandKey(col("text")).as("b"))
      .filter(col("b").isNotNull).distinct().count()
    assert(out.count() === nBands)
    assert(out.select("band").distinct().count() === nBands)
  }
}
