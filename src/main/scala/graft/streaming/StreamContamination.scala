package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.util.Tables

/** Streaming benchmark-contamination screen: flag training documents that
  * share word n-grams with an evaluation suite, as the documents ARRIVE —
  * the online admission-control twin of the batch
  * [[graft.ops.Dedup.contamination]] sweep.
  *
  * Design for scale: the benchmark side is intrinsically small (eval
  * suites, not the corpus), so its distinct shingle set ships to every
  * executor as a broadcast-style array literal and the check is a pure
  * in-row projection — `array_intersect` of the document's own shingle
  * array against the benchmark set. No stream-static join, no streaming
  * aggregation, no state at all: append-mode safe, watermark-free, and
  * the 100 TB/day firehose never shuffles. (The batch sweep counts
  * overlap per (train_doc, bench_doc) pair; the streaming screen decides
  * per arriving document against the benchmark set as a whole — the
  * admission decision needs the verdict, not the attribution, and
  * attribution of flagged docs can run offline on the tiny flagged
  * subset.)
  */
object StreamContamination {

  /** Collect the benchmark's distinct n-gram shingles (bench = doc_id <
    * `benchMax`, mirroring [[Dedup.contamination]]). Driver-side by
    * construction: this is the small side. */
  def benchShingles(spark: SparkSession, dir: String, n: Int = 5,
      benchMax: Long = 10L): Seq[String] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") < benchMax)
      .select(explode(Dedup.shingleArray(col("text"), n)).as("s"))
      .distinct().as[String].collect().toSeq
  }

  /** Documents sharing ≥ `minShared` distinct n-grams with the benchmark
    * set, with the overlap count. Works identically on a streaming or a
    * batch frame (it is a stateless projection + filter), which is the
    * equivalence the spec asserts. `docs` needs (doc_id, text). */
  def flagged(docs: DataFrame, bench: Seq[String], n: Int = 5,
      minShared: Int = 3): DataFrame = {
    val hits = size(array_intersect(
      Dedup.shingleArray(col("text"), n), typedLit(bench)))
    docs.withColumn("n_shared", hits.cast("long"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("n_shared"))
  }
}
