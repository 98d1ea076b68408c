package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact statistical moments over integer cents, as a typed
  * [[Aggregator]] — the UDAF face of the engine's extension surface
  * (alongside the native codegen'd expression [[VecDot]] and the custom
  * window function Ewma).
  *
  * Float `var_samp` at 100 TB is neither exact nor reproducible: the
  * accumulation order of doubles changes with partitioning, so two runs
  * of the same job disagree in the low bits. Integer moments (n, Σx,
  * Σx²) are EXACT and their merge is plain addition — associative and
  * commutative, so 1000 executors can combine partials in any order and
  * the variance derived at the end is bit-identical every run. (At true
  * 100 TB scale the Σx² partial belongs in a DECIMAL(38,0)/128-bit
  * buffer; the query-shape twin `Analytics.exactVariance` documents
  * that path. Long covers this harness's value range with 5 orders of
  * margin.)
  *
  * The preferred production form is the built-in-sum column algebra in
  * `Analytics.exactVariance` (whole-stage codegen, no serialization);
  * this Aggregator exists to cover the typed-UDAF API axis and is
  * asserted equal to the built-in form in FunctionsSpec.
  */
object ExactMoments extends Aggregator[Long, (Long, Long, Long), (Long, Long, Long)] {
  override def zero: (Long, Long, Long) = (0L, 0L, 0L)
  override def reduce(b: (Long, Long, Long), x: Long): (Long, Long, Long) =
    (b._1 + 1L, b._2 + x, b._3 + x * x)
  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)
  override def finish(m: (Long, Long, Long)): (Long, Long, Long) = m
  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
}
