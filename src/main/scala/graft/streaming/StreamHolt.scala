package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the [[graft.indicators.Holt]] window function: the
  * coupled level/trend recurrence carried as per-key `GroupState`, so a
  * live feed gets the same forecasts the batch window computes — state
  * per key is ONE (s, b, n) cell regardless of stream length, the same
  * O(1)-per-key shape as the batch WindowExec evaluation.
  *
  * The fold uses the exact operation order of the window function's
  * update expressions (α·x + (1−α)·(s+b); β·(s_t−s_{t−1}) + (1−β)·b), so
  * streaming and batch agree BIT-FOR-BIT — asserted in StreamHoltSpec
  * along with micro-batch-split invariance.
  *
  * Ordering contract (same as [[StatefulIndicators]]): rows may arrive
  * out of order within a micro-batch (sorted here by seq_no) but not
  * across batches; cross-batch late data is a batch-path recompute.
  */
object StreamHolt {

  final case class Obs(key: String, seq_no: Long, x: Double)
  final case class HoltState(s: Double, b: Double, n: Long)
  final case class HoltRow(key: String, seq_no: Long,
      level: Double, trend: Double, forecast: Double)

  private[streaming] def step(st: Option[HoltState], x: Double,
      alpha: Double, beta: Double): HoltState = st match {
    case None => HoltState(x, 0.0, 1L)
    case Some(p) =>
      val s = alpha * x + (1 - alpha) * (p.s + p.b)
      val b = beta * (s - p.s) + (1 - beta) * p.b
      HoltState(s, b, p.n + 1)
  }

  /** Attach to a (streaming or batch) observation Dataset; append mode. */
  def attach(obs: Dataset[Obs], alpha: Double = 0.5,
      beta: Double = 0.3): Dataset[HoltRow] = {
    implicit val stEnc: Encoder[HoltState] = Encoders.product[HoltState]
    implicit val outEnc: Encoder[HoltRow] = Encoders.product[HoltRow]
    obs.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Obs], state: GroupState[HoltState]) =>
          val sorted = rows.toSeq.sortBy(_.seq_no)
          var st = state.getOption
          val out = sorted.map { r =>
            val next = step(st, r.x, alpha, beta)
            st = Some(next)
            HoltRow(key, r.seq_no, next.s, next.b, next.s + next.b)
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
