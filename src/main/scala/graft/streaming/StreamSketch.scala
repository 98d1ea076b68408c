package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming face of the count-min sketch ([[TextAnalysis.countMin]]):
  * the d×w cell matrix maintained CONTINUOUSLY over a document stream.
  *
  * Counter cells are additive, so incremental maintenance is exactly a
  * stateful streaming aggregation on the (row, bucket) key — each
  * micro-batch's partial counts merge into the running cells by
  * addition, state is the fixed d·w cells regardless of stream length,
  * and the result after any batch split equals the batch sketch over
  * the union (StreamSketchSpec asserts both). This is the property that
  * makes CM the sketch you keep per ingest shard at 100 TB: per-stream
  * cells merge downstream by the same cell-wise addition, never by
  * re-reading text.
  */
object StreamSketch {

  /** Attach to a streaming (or batch) frame with a `text` column.
    * Run with output mode `complete` (the aggregate is d·w rows) or
    * `update` for a changelog of touched cells. */
  def cells(docs: DataFrame, d: Int = 4, w: Int = 64): DataFrame =
    TextAnalysis.cmCells(
      docs.select(explode(TextAnalysis.bigramTerms(col("text"))).as("term")),
      d, w)
}
