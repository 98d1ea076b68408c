package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.ops.TextAnalysis

/** Guarantees of the mergeable Misra-Gries summary. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(xs: Seq[String], k: Int, parts: Int): Map[String, Long] =
    spark.createDataset(xs).repartition(parts)
      .select(new MisraGries(k).toColumn.name("mg")).head()

  test("k=2 textbook stream keeps the majority items") {
    // 5xa, 4xb, 1xc, 1xd interleaved: a and b must survive (counts
    // > N/(k+1) = 11/3), estimates undercount by at most 3
    val xs = Seq("a", "b", "a", "b", "c", "a", "b", "d", "a", "b", "a")
    val m = summarize(xs, k = 2, parts = 1)
    assert(m.size <= 2)
    assert(m.contains("a") && m.contains("b"))
    assert(m("a") <= 5 && m("a") >= 5 - 11 / 3)
    assert(m("b") <= 4 && m("b") >= 4 - 11 / 3)
  }

  test("undercount bound and size cap hold for EVERY key under any partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val keys = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .select(when(col("term").isin("join", "hash", "row"), col("term"))
        .otherwise(concat(col("term"), lit("_"),
          (col("doc_id") % 97).cast("string"))).as("key"))
      .as[String].collect().toSeq
    val exact = keys.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val n = keys.size.toLong
    val k = 16
    for (parts <- Seq(1, 3, 8)) {
      val m = summarize(keys, k, parts)
      assert(m.size <= k, s"size cap broken at parts=$parts")
      exact.foreach { case (t, cnt) =>
        val est = m.getOrElse(t, 0L)
        assert(est <= cnt, s"overcount for $t at parts=$parts")
        assert((cnt - est) * (k + 1) <= n,
          s"undercount bound broken for $t at parts=$parts: cnt=$cnt est=$est n=$n")
      }
    }
  }

  test("gated certification columns are all green") {
    val rows = TextAnalysis.misraGries(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("presence_ok") == 1L)
      assert(r.getAs[Long]("le_exact_ok") == 1L)
      assert(r.getAs[Long]("bound_ok") == 1L)
      assert(r.getAs[Long]("tracked_le_k") == 1L)
    }
  }
}
