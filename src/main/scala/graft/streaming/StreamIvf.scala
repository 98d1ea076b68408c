package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming IVF index maintenance: a live embedding feed is assigned
  * to a FIXED centroid set and the per-bucket occupancy counts update
  * every micro-batch — the freshness half of an IVF deployment (the
  * batch half, training the centroids, is `Similarity.ivfKmeans`; the
  * occupancy counts are what decide when a bucket has drifted enough
  * to warrant re-training).
  *
  * Streaming constraint shapes the plan: chained aggregations are
  * illegal in a streaming query, so the nearest-centroid argmin is NOT
  * a join + min-struct groupBy (the batch formulation) — it is a single
  * in-row expression over the k-bounded centroid array (zip_with dot
  * products + array_min of (d2, id) structs, lowest-id tiebreak), which
  * leaves exactly ONE aggregation (the bucket count) for the streaming
  * engine. Centroids ride the closure as literals — k·d cells, the same
  * boundedness as every broadcast codebook in `Similarity`.
  *
  * Exactness: 1e-5 quantized integer components, integer squared
  * distances — assignment is engine-exact and micro-batch invariant
  * (StreamIvfSpec re-splits the stream and requires identical counts).
  */
object StreamIvf {

  /** In-row nearest-centroid id for a quantized vector column. */
  def assignExpr(q: Column, cents: Seq[(Long, Seq[Long])]): Column = {
    val scored = array(cents.map { case (id, cv) =>
      val carr = array(cv.map(lit(_)): _*)
      struct(
        aggregate(zip_with(q, carr, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"),
        lit(id).as("centroid_id"))
    }: _*)
    array_min(scored).getField("centroid_id")
  }

  /** Running per-bucket counts over a (vec_id, embedding) stream.
    * `quant` must match the centroids' quantization scale — pass 1000L
    * to census against [[graft.ops.Similarity.ivfMaintenance]]'s
    * integer centroids (IvfMaintenanceSpec asserts bit-equality with
    * the batch delta census and the same re-train decision). */
  def bucketCounts(input: DataFrame, cents: Seq[(Long, Seq[Long])],
      quant: Long = 100000L): DataFrame =
    input
      .select(transform(col("embedding"),
        e => round(e.cast("double") * quant).cast("long")).as("q"))
      .select(assignExpr(col("q"), cents).as("centroid_id"))
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vecs"))
}
