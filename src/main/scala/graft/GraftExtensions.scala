package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.indicators.Ewma

/** Session-extension entry point: registers graft's custom Catalyst
  * functions at session build, so a cluster deploy enables them with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * and `SELECT ewma(price, 0.095) OVER (...)` works in plain SQL with no
  * Scala in the user's path. (In-library callers can keep using
  * `Indicators.register(spark)` / `Ewma.bySpan`, which install the same
  * builder per session at runtime.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ewma"),
      new ExpressionInfo(classOf[Ewma].getName, "ewma"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Ewma(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("str_hamming"),
      new ExpressionInfo(classOf[graft.functions.StrHamming].getName, "str_hamming"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.StrHamming(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("tok_count"),
      new ExpressionInfo(classOf[graft.functions.TokCount].getName, "tok_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TokCount(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("byte_at"),
      new ExpressionInfo(classOf[graft.functions.ByteAt].getName, "byte_at"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ByteAt.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("url_part"),
      new ExpressionInfo(classOf[graft.functions.UrlPart].getName, "url_part"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.UrlPart.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNorm].getName, "unicode_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.UnicodeNorm.build(exprs)))
    // logical rewrite: banded levenshtein for threshold predicates
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
  }
}
