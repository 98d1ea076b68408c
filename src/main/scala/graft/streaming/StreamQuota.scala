package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming face of the per-domain document quota
  * ([[graft.ops.Web.domainCap]]): admission control with ONE `ValueState`
  * counter per registered domain — O(1) state per key regardless of
  * stream length, the `transformWithState` shape of RefinedWeb-style
  * crawl curation running ON INGEST instead of as a batch sweep.
  *
  * Semantics differ from the batch quota deliberately: batch picks the
  * best `cap` documents per domain in priority order (it sees the whole
  * corpus); the stream admits the FIRST `cap` arrivals per domain (it
  * cannot see the future). What is invariant across both — and across
  * any micro-batch split of the same stream (StreamQuotaSpec) — is the
  * admitted COUNT per domain: min(total, cap). At 100 TB the counter
  * state lives in RocksDB keyed by domain (bounded by |domains|, not
  * corpus), and rejected documents never reach the sink.
  */
object StreamQuota {

  final case class DocRef(domain: String, doc_id: Long)
  final case class Decision(domain: String, doc_id: Long, admitted: Boolean)

  /** Admit while the domain's running count is below `cap`. State is a
    * bare Long via `Encoders.scalaLong`: a single-field case class here
    * made Spark's generated state encoder fail janino compilation and
    * fall back to interpreted serialization on every state access. */
  class QuotaProcessor(cap: Long)
      extends StatefulProcessor[String, DocRef, Decision] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocRef],
        timerValues: TimerValues): Iterator[Decision] = {
      var n = if (st.exists()) st.get() else 0L
      val out = rows.map { r =>
        val admit = n < cap
        if (admit) n += 1
        Decision(key, r.doc_id, admit)
      }.toVector // drain before updating state: the iterator is lazy
      st.update(n)
      out.iterator
    }
  }

  /** Attach to a (streaming or batch) Dataset of (domain, doc_id). */
  def decisions(docs: Dataset[DocRef], cap: Long = 3): Dataset[Decision] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.domain)
      .transformWithState(new QuotaProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
