package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact covariance-matrix accumulator over quantized embedding
  * vectors: one pass, O(d²) state per partition, NO row explosion.
  *
  * The naive covariance plan (posexplode twice, self-join per vector,
  * groupBy cell) materializes n·d²/2 rows before the shuffle — at
  * d = 64 that is 2080× the corpus, which is the difference between a
  * 100 TB pass and a 200 PB pass. This Aggregator instead folds each
  * vector's outer product into a single packed long[] buffer
  * (count ‖ d per-dimension sums ‖ d(d+1)/2 upper-triangle cross
  * sums), so the shuffle moves exactly one 2145-cell buffer per
  * map-side partial — the d²-not-n·d² design every distributed PCA
  * uses. Spark plans it as ObjectHashAggregate: the buffer lives as a
  * JVM object per partition and serializes only at the partial-merge
  * boundary.
  *
  * Exactness: inputs are 1e-5-quantized BIGINT components, every cell
  * is an integer sum of integer products — associative, commutative,
  * partitioning-invariant, and replayable bit-for-bit by the DuckDB
  * oracle's (affordable at oracle SF) explode formulation. Range: at
  * |x| ≤ 0.6 the per-row product is ≤ 3.6e9, so long sums hold to
  * n ≈ 2.5e9 vectors; past that the buffer belongs in DECIMAL(38,0)
  * cells (the same migration note as [[ExactMoments]]).
  *
  * Downstream (`ops/Pca.scala`): mean-centered covariance cells are a
  * closed-form function of these exact integers, and the top principal
  * component falls out of a fixed-iteration power method on the
  * d²-bounded matrix — PCA/whitening before IVF/PQ indexing is the
  * standard 100 TB embedding-pipeline preprocessing pass.
  */
class CovAccum(d: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
    require(x.length == d, s"CovAccum(d=$d) got a ${x.length}-dim vector")
    val xa = x.toArray
    b(0) += 1L
    var i = 0
    var idx = 1 + d
    while (i < d) {
      b(1 + i) += xa(i)
      var j = i
      while (j < d) { b(idx) += xa(i) * xa(j); idx += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(m: Array[Long]): Seq[Long] = m.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object CovAccum {
  /** SQL-path registration: `SELECT cov_accum_<d>(q) FROM ...` for the
    * dimensioned instance — UDAFs carry state shape in the function, so
    * each d registers its own name (the engine's query builders pass the
    * Aggregator directly; this face exists for plain-SQL users and is
    * smoke-checked in FunctionsSpec). */
  def register(spark: org.apache.spark.sql.SparkSession, d: Int): Unit =
    spark.udf.register(s"cov_accum_$d",
      org.apache.spark.sql.functions.udaf(new CovAccum(d),
        ExpressionEncoder[Seq[Long]]()))
}
