package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversions.
  *
  * Spark 4 made `Column` backend-agnostic (a `ColumnNode` wrapper), so the
  * old `new Column(expr)` constructor is gone; the supported classic-backend
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]`. This file sits under `org.apache.spark.sql` solely to
  * re-export those two conversions for graft's custom Catalyst expressions
  * (e.g. the EWMA window function). No Spark internals are modified.
  */
object Bridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column (classic backend). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
