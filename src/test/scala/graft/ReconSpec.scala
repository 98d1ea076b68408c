package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.util.Tables

/** Reconciliation primitives: table checksum + keyed snapshot diff. */
class ReconSpec extends SparkSpec {
  import spark.implicits._

  test("checksum is order-invariant but flips on any single-value change") {
    val dir = java.nio.file.Files.createTempDirectory("recon").toString
    val li = Tables.lineitem(spark, sf)
    li.write.parquet(s"$dir/lineitem.parquet")
    val base = Analytics.tableChecksum(spark, sf).as[(Long, Long)].head()
    // same rows, different physical order/partitioning -> same checksum
    val reparted = Analytics.tableChecksum(spark, dir).as[(Long, Long)].head()
    assert(reparted === base)
    // one mutated value -> same row count, different checksum
    val dir2 = java.nio.file.Files.createTempDirectory("recon2").toString
    val (k0, ln0) = li.select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Int)].head()
    li.withColumn("l_quantity",
        when(col("l_orderkey") === k0 && col("l_linenumber") === ln0,
          col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      .write.parquet(s"$dir2/lineitem.parquet")
    val mutated = Analytics.tableChecksum(spark, dir2).as[(Long, Long)].head()
    assert(mutated._1 === base._1)
    assert(mutated._2 !== base._2)
  }

  test("snapshot diff classes carry exactly the engineered drift") {
    val counts = Analytics.snapshotDiff(spark, sf)
      .as[(String, Long)].collect().toMap
    val keys = Tables.orders(spark, sf)
      .select(col("o_orderkey")).as[Long].collect()
    val added = keys.count(_ % 97 == 0).toLong
    val changed = keys.count(k => k % 97 != 0 && k % 31 == 0).toLong
    val unchanged = keys.length - added - changed
    assert(counts.getOrElse("added", 0L) === added)
    assert(counts.getOrElse("changed", 0L) === changed)
    assert(counts.getOrElse("unchanged", 0L) === unchanged)
    assert(!counts.contains("removed")) // old side is a strict subset
  }

  test("equi-depth deciles: sizes differ by at most one, value-ordered, per user") {
    val bins = Analytics.equidepthBins(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    bins.groupBy(_._1).foreach { case (_, ds) =>
      val sizes = ds.map(_._3)
      assert(sizes.max - sizes.min <= 1) // ntile balance
      val ordered = ds.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (1L to ordered.length).toSeq)
      // non-decreasing across bins (ties may touch the boundary exactly)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4) // hi(d) <= lo(d+1)
        case _ => ()
      }
    }
  }

  test("length buckets: power-of-two, tight (n in (b/2, b]), padding exact") {
    val out = Analytics.lengthBuckets(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (b, nDocs, total, pad) =>
      assert((b & (b - 1)) === 0L) // power of two
      assert(pad === b * nDocs - total)
      assert(total <= b * nDocs && total > b / 2 * nDocs) // every doc fits tightly
    }
    // bucket histogram covers every document exactly once
    assert(out.map(_._2).sum === Tables.documents(spark, sf).count())
  }

  test("merge apply: deletes gone, updates applied, inserts added, rest untouched") {
    val out = Analytics.mergeApply(spark, sf)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    base.foreach { case (k, st, c) =>
      if (k % 7 == 0) assert(out(k) === (("X", c + 100000L)))      // updated
      else if (k % 11 == 0) assert(!out.contains(k))               // deleted
      else {
        assert(out(k) === ((st, c)))                               // untouched
        if (k % 13 == 0) assert(out(k + 10000000L) === ((st, c)))  // inserted copy
      }
    }
    val nDel = base.count(r => r._1 % 7 != 0 && r._1 % 11 == 0)
    val nIns = base.count(r => r._1 % 7 != 0 && r._1 % 11 != 0 && r._1 % 13 == 0)
    assert(out.size === base.length - nDel + nIns)
  }

  test("incremental agg merge is lossless: state+delta equals full recompute") {
    val merged = Analytics.incrementalAgg(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val full = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(merged === full)
  }
}
