package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** User-facing entry to the custom plan nodes. */
object Graft {

  /** Ensure [[TopKStrategy]] participates in planning for this session
    * (idempotent). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  /** Exact top-`k` rows per `keyCols` group, "top" = first in
    * `orderCols` (each (name, descending)); supply a unique tie-break
    * column for a deterministic result set. Same semantics as the
    * row_number-window form, executed sort-free with map-side partial
    * pruning — see [[TopKPerKey]]. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      sys.error(s"column $n not in ${lp.output.map(_.name)}"))
    val order = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(spark,
      TopKPerKey(keyCols.map(attr), order, k, lp))
  }
}
