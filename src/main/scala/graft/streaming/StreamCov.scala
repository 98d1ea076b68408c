package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.CovAccum

/** Streaming covariance: the SAME packed integer aggregate as the batch
  * PCA pass ([[graft.functions.CovAccum]]), run as a streaming
  * aggregation — the state store holds one 2145-cell buffer and each
  * micro-batch folds its vectors in by plain addition. Because the
  * buffer's merge is associative and commutative, the streaming result
  * is bit-identical to the batch covariance over the same rows no
  * matter how the stream is micro-batched — the property StreamCovSpec
  * asserts by re-splitting the input.
  *
  * This is the monitoring deployment of the second-moment pass: a
  * live embedding feed keeps a running covariance (per model version,
  * keyed by `split`), and [[graft.ops.Pca.covDrift]]'s cell compare
  * runs downstream on two such summaries. State is O(d²) per key —
  * independent of stream length.
  */
object StreamCov {

  /** (split, m) per key: packed [n | d sums | d(d+1)/2 cross sums]. */
  def packed(input: DataFrame, d: Int = 64): DataFrame = {
    val covUdf = udaf(new CovAccum(d), ExpressionEncoder[Seq[Long]]())
    input
      .select((col("vec_id") % 2).cast("int").as("split"),
        transform(col("embedding"),
          e => round(e.cast("double") * 100000).cast("long")).as("q"))
      .groupBy(col("split")).agg(covUdf(col("q")).as("m"))
  }
}
