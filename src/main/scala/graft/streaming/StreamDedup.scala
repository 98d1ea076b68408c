package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Streaming near-duplicate suppression: admit a document only if no
  * LSH-equivalent document was seen before it, with state bounded by a
  * watermark.
  *
  * The signature is computed entirely map-side ([[Dedup.shingleArray]] +
  * in-row `array_min` MinHash — a pure projection, legal on a stream),
  * so the only stateful operator is the per-key first-occurrence dedup.
  * This uses the b=1, r=[[Dedup.RowsPerBand]] banding scheme: ONE band of
  * r MinHash rows, collision ⇔ candidate. A single key per document is
  * what makes streaming dedup a plain `dropDuplicatesWithinWatermark`;
  * the batch pipeline's b=4 multi-band recall needs a doc in 4 buckets
  * at once, which a streaming dedup cannot express without a two-phase
  * consensus — documented trade-off, higher effective threshold.
  *
  * State: one (band-key → seen) entry per admitted document, evicted
  * once the event-time watermark passes `delay` — bounded by the unique-
  * document arrival rate times the window, not the stream length.
  */
object StreamDedup {

  /** The b=1 LSH band key of a document text: md5 over the first
    * [[Dedup.RowsPerBand]] MinHash rows. Null for docs too short to
    * carry a shingle (callers filter those). */
  def bandKey(text: Column): Column = {
    val dg = Dedup.shingleArray(text)
    val rows = (0 until Dedup.RowsPerBand).map(k =>
      array_min(transform(dg, s => md5(concat(lit(s"mh$k|"), s)))))
    when(size(dg) > 0, md5(concat_ws("|", rows: _*)))
  }

  /** First occurrence per LSH band within the watermark window. Works on
    * a streaming frame (micro-batch order decides "first"); on a batch
    * frame it degrades to dropDuplicates on the same key, which is the
    * equivalence the spec asserts. `docs` needs (doc_id, ts, text). */
  def firstOccurrences(
      docs: DataFrame,
      tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame = {
    val keyed = docs
      .withColumn("band", bandKey(col("text")))
      .filter(col("band").isNotNull)
    if (docs.isStreaming)
      keyed.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("band")
    else keyed.dropDuplicates("band")
  }
}
