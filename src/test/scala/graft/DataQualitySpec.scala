package graft

import org.apache.spark.sql.functions._

import graft.ops.DataQuality
import graft.util.Tables

/** Deequ-style constraint-suite operator. Values are gated exactly by
  * the DuckDB oracle at sf0.01; here the structural invariants plus an
  * independent recount of the one cross-table check. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("dqChecks: one row per check, 0 <= violations <= checked") {
    val rows = DataQuality.dqChecks(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length === 11)
    assert(rows.map(_._1).distinct.length === 11)
    rows.foreach { case (c, n, v) =>
      assert(n > 0, s"$c: empty check domain")
      assert(v >= 0 && v <= n, s"$c: violations $v outside [0, $n]")
    }
  }

  test("dqChecks: ship-before-order violations match an independent recount") {
    val rows = DataQuality.dqChecks(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    assert(rows("lineitem.l_shipdate.gte.o_orderdate")._2 === expected)
    // RI holds on the synthetic star schema — the clean checks stay clean
    assert(rows("orders.o_custkey.refers.customer")._2 === 0L)
    assert(rows("lineitem.l_orderkey.refers.orders")._2 === 0L)
  }

  test("benford: 9 digits, counts partition the positive rows, probs sum to 1") {
    val rows = DataQuality.benford(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === (1 to 9))
    val positives = Tables.lineitem(spark, sf)
      .filter(col("l_extendedprice") > 0).count()
    assert(rows.map(_._2).sum === positives)   // digits partition the rows
    rows.foreach { case (_, obs, n, p, chi2) =>
      assert(n === positives)
      assert(p > 0 && p < 1)
      assert(chi2 >= 0, s"negative chi-square part $chi2 (obs=$obs)")
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
  }

  test("kAnonymity: classes partition the corpus; flags match their definitions") {
    val rows = DataQuality.kAnonymity(spark, sf, k = 10)
      .as[(String, Long, Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum === total) // equivalence classes partition
    rows.foreach { case (lang, bucket, size, ldiv, risk, fk, fl) =>
      assert(size > 0 && ldiv > 0)
      assert(ldiv <= size, s"($lang,$bucket): l-diversity exceeds class size")
      assert(math.abs(risk - 1.0 / size) < 1e-6)
      assert(fk === (if (size < 10) 1L else 0L))
      assert(fl === (if (ldiv < 2) 1L else 0L))
    }
  }
}
