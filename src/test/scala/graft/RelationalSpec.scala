package graft

import org.apache.spark.sql.functions._

import graft.ops.{Linkage, TextAnalysis}
import graft.queries.Relational
import graft.util.Tables

/** TPC-H-adapted relational pack + record linkage + n-gram novelty
  * (round 4). Values are gated exactly by the DuckDB oracle at sf0.01;
  * these specs assert the structural invariants a correct plan must
  * satisfy at any scale factor. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("tradeVolume: no domestic pairs; symmetric pair coverage") {
    val rows = Relational.tradeVolume(spark, sf)
      .as[(String, String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, c, y, cents, n) =>
      assert(s != c); assert(y == 1996 || y == 1997)
      assert(n > 0 && cents != 0L)
    }
  }

  test("shipPriority: high+low equals the filtered join cardinality") {
    val rows = Relational.shipPriority(spark, sf)
      .as[(String, Long, Long)].collect()
    val total = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")))
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .count()
    assert(rows.map(r => r._2 + r._3).sum === total)
  }

  test("promoShare: ratio consistent with its own numerator/denominator") {
    val (pct, promo, total) = Relational.promoShare(spark, sf)
      .as[(Double, Long, Long)].head()
    assert(promo >= 0 && promo <= total)
    assert(math.abs(pct - 100.0 * promo / total) < 1e-9)
  }

  test("largeVolumeCustomers: every order's rollup exceeds the threshold") {
    val rows = Relational.largeVolumeCustomers(spark, sf)
      .as[(Long, String, Long, java.sql.Timestamp, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_._5 > 15000L))
    // descending, orderkey tiebreak
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 > b._5 || (a._5 == b._5 && a._3 < b._3))
      case _ =>
    }
  }

  test("brandRevenue: matches an independently-composed filter") {
    val (cents, n) = Relational.brandRevenue(spark, sf)
      .as[(Long, Long)].head()
    val brute = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_type" === "PROMO" && $"p_size".between(1, 15) &&
          $"l_quantity".between(10, 30)) ||
        ($"p_type" === "SMALL" && $"p_size".between(16, 35) &&
          $"l_quantity".between(20, 40)) ||
        ($"p_type" === "LARGE" && $"p_size".between(36, 50) &&
          $"l_quantity".between(25, 50)))
      .count()
    assert(n === brute)
    assert((cents > 0) === (n > 0))
  }

  test("fuzzyPairsByBrand: block join equals quadratic scan at this sf") {
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand", $"p_name")
      .as[(Long, String, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- parts; b <- parts
      if a._2 == b._2 && a._1 < b._1
      dist = lev(a._3, b._3) if dist <= 4
    } yield (a._2, dist)).groupBy(_._1).map { case (brand, xs) =>
      brand -> ((xs.length.toLong, xs.map(_._2).min, xs.map(_._2.toLong).sum))
    }
    val got = Linkage.fuzzyPairsByBrand(spark, sf)
      .as[(String, Long, Int, Long)].collect()
      .map { case (b, n, mn, s) => b -> ((n, mn, s)) }.toMap
    assert(got === brute)
  }

  test("ngramNovelty: doc 0 is fully novel; ratios within [0,1]") {
    val rows = TextAnalysis.ngramNovelty(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_._1)
    assert(first._2 === first._3) // earliest doc: every shingle first-seen
    rows.foreach { case (_, n, novel, ratio) =>
      assert(novel >= 0 && novel <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // total novel count = global distinct shingle count
    val distinctShingles = graft.ops.Dedup
      .shingles(Tables.documents(spark, sf)).select("s").distinct().count()
    assert(rows.map(_._3).sum === distinctShingles)
  }

  test("existenceJoins: semi + anti partition every nation's customers") {
    val rows = graft.queries.Relational.existenceJoins(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nation, total, semi, anti) =>
      assert(semi + anti === total,
        s"$nation: semi($semi) + anti($anti) != total($total)")
    }
    // independent recount of the semi side via a distinct-key join
    val urgentCust = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val expectSemi = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(urgentCust, col("c_custkey") === col("o_custkey"))
      .groupBy(col("n_name")).count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (nation, _, semi, _) =>
      assert(expectSemi.getOrElse(nation, 0L) === semi, s"$nation: semi count drifted")
    }
  }
}
