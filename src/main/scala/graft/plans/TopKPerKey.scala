package graft.plans

import scala.collection.mutable.PriorityQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension demo — the (c) rung of the custom-operator
  * ladder (compose built-ins → custom Expression → custom LogicalPlan +
  * Strategy + SparkPlan): exact per-key top-k WITHOUT a sort.
  *
  * The declarative form (`row_number() OVER (PARTITION BY key ORDER BY
  * ...) <= k`, q_topk_per_group) must SORT every key's whole group —
  * O(n log n) per partition and a full sort buffer — because a rank
  * window cannot know k rows would suffice. This operator keeps a
  * k-bounded heap per key instead: O(n log k) comparisons, memory
  * bounded by k·keys, and — the part that matters at 100 TB — it runs
  * BEFORE the shuffle too (partial → exchange → final, exactly like a
  * partial aggregation), so each map task ships at most k rows per key
  * instead of its whole slice of every group. The final pass declares
  * `ClusteredDistribution(keys)`, so EnsureRequirements inserts the one
  * hash exchange; AQE still plans/coalesces it normally.
  *
  * MEMORY GUARD (no spill path — the heaps live in an in-memory hash
  * map, unlike Window/Sort which spill). Memory per task is O(k ×
  * distinct keys); `spark.graft.topk.maxKeysPerTask` (default 4M) hard-
  * bounds it at three levels:
  *   - map-side (partial): past the cap, rows of NEW keys stream through
  *     un-pruned — the final pass still prunes them, so the result stays
  *     exact and memory stays bounded; only the shuffle savings degrade.
  *   - reduce-side (final): exactness needs every key's full row set, so
  *     past the cap the task fails fast with a pointer at the window
  *     form rather than dying opaquely in GC/OOM.
  *   - plan time: [[Graft.topKPerKey]] with a `distinctKeysHint` above
  *     the cap plans the spillable `row_number OVER (...) <= k` window
  *     form instead (identical semantics, asserted in TopKSpec).
  * With bounded key cardinality (symbols, exchanges, categories — the
  * intended domain) the heaps are the whole point; with unbounded keys
  * (user id over a 100 TB event log) the window form is the right
  * operator, and the guard makes that boundary explicit.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial + final [[TopKPerKeyExec]]. Inject via
  * `spark.experimental.extraStrategies` ([[Graft.topKPerKey]] does) or a
  * SparkSessionExtensions planner-strategy rule. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, global = true,
        TopKPerKeyExec(keys, order, k, global = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap pass: per key, keep the k first rows in `order`.
  * `global=false` runs map-side on whatever partitioning arrives;
  * `global=true` requires clustering on `keys` and yields the exact
  * result. Rows are compared by a codegen'd ordering; the heap's head is
  * the WORST kept row, evicted when a better one arrives. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, global: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (global) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val schema = child.output
    val isGlobal = global
    val maxKeys = session.conf
      .get(TopKPerKeyExec.MaxKeysConf, TopKPerKeyExec.MaxKeysDefault.toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = GenerateOrdering.generate(sortOrder, schema)
      val heaps = new java.util.HashMap[UnsafeRow, PriorityQueue[InternalRow]]()
      // overflow handling keeps task memory hard-bounded at maxKeys heaps:
      // map-side, rows of keys beyond the cap STREAM through un-pruned
      // (emitted immediately, never buffered — the final pass prunes
      // them, so the result stays exact); reduce-side, exactness needs
      // the full key set, so the task fails fast with guidance instead
      // of dying in GC
      val streamed = iter.flatMap { row =>
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null && heaps.size() >= maxKeys) {
          if (isGlobal) throw new IllegalStateException(
            s"TopKPerKey final pass exceeded ${TopKPerKeyExec.MaxKeysConf}=" +
              s"$maxKeys distinct keys in one task; this operator holds " +
              "k rows per key in memory and does not spill — use the " +
              "row_number window form (Graft.topKPerKey with " +
              "distinctKeysHint) for unbounded key cardinality")
          Iterator.single(row) // handed straight downstream, no buffering
        } else {
          if (pq == null) {
            pq = PriorityQueue.empty[InternalRow](ord) // max-heap: head = worst
            heaps.put(key.copy(), pq)
          }
          if (pq.size < kk) pq.enqueue(row.copy())
          else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          Iterator.empty
        }
      }
      // ++ evaluates its right side lazily — the heaps drain only after
      // the input (and thus every overflow row) is exhausted
      streamed ++ heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }
}

object TopKPerKeyExec {
  val MaxKeysConf = "spark.graft.topk.maxKeysPerTask"
  val MaxKeysDefault: Long = 4L * 1024 * 1024
}
