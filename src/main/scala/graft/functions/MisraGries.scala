package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982) as a mergeable
  * typed [[Aggregator]] — at most `k` (key, counter) pairs regardless of
  * stream length, with the deterministic guarantees
  *
  *   exact − N/(k+1)  ≤  estimate  ≤  exact
  *
  * for EVERY key (N = total arrivals), hence any key with exact count
  * > N/(k+1) is guaranteed present. The merge is the Agarwal et al.
  * (Mergeable Summaries, PODS 2012) combine: counter-wise addition, then
  * subtract the (k+1)-th largest counter and keep the positive
  * survivors — it preserves the error bound under ANY merge tree, which
  * is exactly what a 1000-executor partial-aggregate needs: each map
  * task folds its partition into ≤ k counters, the exchange carries
  * O(tasks · k) rows, and the reduce side combines in whatever order
  * partials arrive. Spark plans this as ObjectHashAggregate; the
  * summary map serializes only at the partial boundary.
  *
  * Update cost is amortized O(1): a decrement event consumes k+1 count
  * units, so there are at most N/(k+1) of them. The buffer here is an
  * immutable map (one persistent-HAMT update per arrival); a 100 TB
  * deployment would swap in the TypedImperativeAggregate form with a
  * mutable open-addressing table — same algebra, same merge, noted the
  * way [[ExactMoments]] documents its codegen twin.
  *
  * vs the engine's other frequency summaries: approx_top_k
  * (TextAnalysis.heavyHitters) has no per-key deterministic bound, and
  * count–min (TextAnalysis.countMin) overcounts via collisions; MG is
  * the summary that UNDERcounts with a provable margin, so presence
  * above threshold is a certainty, not an estimate — the property the
  * q_misra_gries gate turns into hash-stable boolean columns.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "MisraGries needs at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c)            => b.updated(t, c + 1L)
      case None if b.size < k => b.updated(t, 1L)
      case None => // decrement-all: the arriving item and one unit of
        // every stored counter annihilate (k+1 count units per event)
        b.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // at most k counters are STRICTLY above the (k+1)-th largest, so
      // subtracting it and keeping the positive survivors restores the
      // size bound while total decrement mass stays ≤ N/(k+1)
      val cut = summed.values.toArray.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
