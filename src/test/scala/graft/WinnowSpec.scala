package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Pins graft.functions.WinnowPrints (native one-scan winnowing) to the
  * relational explode + window spelling it replaces — same md5 grams,
  * same w-window minima, same distinct print set — including Unicode
  * (codepoint-addressed grams) and boundary lengths. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 6

  /** The original relational spelling (kept here as the test oracle). */
  private def relational(docs: org.apache.spark.sql.DataFrame) = {
    val base = docs
      .withColumn("np", length($"text") - (k - 1))
      .filter($"np" >= w)
    val grams = base
      .select($"doc_id", $"np",
        explode(sequence(lit(1), $"np")).as("i"), $"text")
      .withColumn("h", md5($"text".substr($"i", lit(k))))
    val win = Window.partitionBy($"doc_id").orderBy($"i")
      .rowsBetween(0, w - 1)
    grams
      .withColumn("sel", min($"h").over(win))
      .filter($"i" <= $"np" - (w - 1))
      .select($"doc_id", $"sel").distinct()
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_prints"),
        min($"sel").as("min_print"), max($"sel").as("max_print"))
      .orderBy($"doc_id")
  }

  private def native(docs: org.apache.spark.sql.DataFrame) = docs
    .withColumn("np", length($"text") - (k - 1))
    .filter($"np" >= w)
    .select($"doc_id",
      graft.functions.WinnowPrints(spark, $"text", k, w).as("wp"))
    .select($"doc_id", $"wp.n_prints".as("n_prints"),
      $"wp.min_print".as("min_print"), $"wp.max_print".as("max_print"))
    .orderBy($"doc_id")

  test("native winnow equals the explode+window form on the fixture corpus") {
    val docs = graft.util.Tables.documents(spark, sf)
    val a = native(docs).as[(Long, Long, String, String)].collect().toSeq
    val b = relational(docs).as[(Long, Long, String, String)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("native winnow equals the window form on unicode + boundary lengths") {
    val docs = Seq(
      // exactly k+w-1 chars -> exactly one window
      (1L, "a" * (k + w - 1)),
      // one char short of a full window -> filtered out by BOTH forms
      (2L, "b" * (k + w - 2)),
      // multi-byte codepoints: grams must address CODEPOINTS, not bytes
      (3L, "äöü€𝄞 the quick brown fox jümps över the lazy dog äöü€"),
      // repeated text -> heavy hash ties inside windows
      (4L, "xy" * 40),
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val a = native(docs).as[(Long, Long, String, String)].collect().toSeq
    val b = relational(docs).as[(Long, Long, String, String)].collect().toSeq
    assert(a === b)
    assert(a.map(_._1) === Seq(1L, 3L, 4L, 5L)) // doc 2 filtered
    assert(a.head._2 === 1L) // doc 1: exactly one window -> one print
  }

  test("q_winnow query runs on the expression and stays shuffle-free before the sort") {
    val plan = Dedup.winnowSummary(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("winnow_prints"))
    // exactly ONE exchange: the input spread repartition; the final sort
    // is a global orderBy (range partitioning counts as its exchange) —
    // assert no exchange carries the window/explode shape
    assert(!plan.contains("explode"), "exploded gram stream reappeared")
    assert(!plan.toLowerCase.contains("window"), "window exchange reappeared")
  }
}
