package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.functions.MisraGries

/** Streaming face of the mergeable Misra–Gries summary
  * ([[graft.functions.MisraGries]]): the ≤ k-counter heavy-hitter state
  * maintained CONTINUOUSLY over an unbounded key stream.
  *
  * The summary is a mergeable aggregate, so incremental maintenance is
  * exactly a complete-mode global aggregation: each micro-batch folds
  * its arrivals into ≤ k counters map-side, and the running state
  * absorbs them through the same Agarwal-et-al combine the batch plan
  * uses — state stays ≤ k entries REGARDLESS of stream length or batch
  * split, and the undercount guarantee (≤ N/(k+1) over the total stream
  * prefix N) holds after every batch under any split
  * (StreamHeavySpec). That per-shard-summary property is the 100 TB
  * story: one ≤ k-entry state per ingest stream, merged downstream by
  * the same combine, never by re-reading the stream.
  */
object StreamHeavy {

  /** Attach to a streaming (or batch) frame whose single column is the
    * key. Run with output mode `complete` (the result is one k-entry
    * map row). */
  def summary(keys: DataFrame, k: Int = 16): Dataset[Map[String, Long]] = {
    import keys.sparkSession.implicits._
    // NB the declared Dataset return type keeps this on the TYPED select
    // overload — the untyped one rejects a TypedColumn at analysis
    keys.as[String].select(new MisraGries(k).toColumn.name("mg"))
  }
}
