package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot grouping/join keys.
  *
  * At 100 TB a handful of hot keys (a viral coin, the `en` language
  * bucket) can pin a whole aggregation on one task. Two standard
  * remedies, both implemented as plain plan rewrites:
  *
  *   - [[saltedAgg]]: two-phase aggregation — partial aggregate on
  *     (key, salt) spreads a hot key over `buckets` tasks, then a final
  *     aggregate on the key merges the partials. Only works for
  *     decomposable aggregates (sum/count/min/max and avg via sum+count).
  *   - AQE skew-join splitting is enabled session-wide
  *     (`spark.sql.adaptive.skewJoin.enabled`, on by default) and handles
  *     the join side without plan changes.
  */
object Skew {

  /** Decomposable aggregate spec: (partial expr, merge of partials). */
  final case class Agg(partial: Column => Column, merge: Column => Column)

  val SumAgg: Agg = Agg(sum, sum)
  val CountAgg: Agg = Agg(c => count(c), sum)
  val MinAgg: Agg = Agg(min, min)
  val MaxAgg: Agg = Agg(max, max)

  /** Two-phase salted aggregation: `df.groupBy(key).agg(...)` semantics,
    * executed as groupBy(key, salt) → groupBy(key).
    *
    * The salt is a deterministic spread over the row's full content hash,
    * so re-runs produce identical partials. Result values are identical
    * to the unsalted plan for decomposable aggregates (modulo the usual
    * float summation-order caveat — use on integral/exact types when
    * bit-parity matters).
    */
  /** Salt-replicated skew join: `fact ⋈ dim` on `key`, with the dim side
    * replicated across `buckets` salts and the fact side salted by a
    * deterministic row hash. A hot fact key (one user producing 1% of a
    * 100 TB log) lands on `buckets` tasks instead of one.
    *
    * Semantically identical to the plain equi-join: every fact row meets
    * exactly one replica of its dim row (the one carrying its salt).
    * Dim-side cost is `|dim| × buckets` rows — use only when dim is small
    * enough to replicate but too large or too hot to broadcast outright;
    * AQE's `skewJoin` covers the sort-merge case without plan changes,
    * this form also pre-spreads the *post-join* groupBy when it reuses
    * the (key, salt) partitioning. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      aggs: Map[String, (String, Agg)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head match { case (out, (in, a)) => a.partial(col(in)).as(out) },
        aggs.tail.toSeq.map { case (out, (in, a)) => a.partial(col(in)).as(out) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head match { case (out, (_, a)) => a.merge(col(out)).as(out) },
        aggs.tail.toSeq.map { case (out, (_, a)) => a.merge(col(out)).as(out) }: _*)
  }
}
