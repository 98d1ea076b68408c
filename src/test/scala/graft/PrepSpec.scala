package graft

import org.apache.spark.sql.functions._

import graft.ops.Prep

/** Semantics of the training-example prep operators on crafted rows —
  * the properties the sf-gated oracles can't isolate. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("piiScan finds exactly the planted markers and redacts them all") {
    val out = Prep.piiScan(spark, sf)
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, e, i, p) =>
      assert(e === (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(i === (if (id % 5 == 0) 1L else 0L), s"doc $id ips")
      assert(p === (if (id % 7 == 0) 1L else 0L), s"doc $id phones")
    }
    // redaction is complete: scanning the redacted text finds nothing
    val redacted = Prep.withPlantedPii(graft.util.Tables.documents(spark, sf))
      .select(regexp_replace(regexp_replace(regexp_replace($"text",
        Prep.EmailRx, "<EMAIL>"), Prep.Ipv4Rx, "<IP>"), Prep.PhoneRx, "<PHONE>")
        .as("t"))
      .select(regexp_count($"t", lit(Prep.EmailRx)) +
        regexp_count($"t", lit(Prep.Ipv4Rx)) +
        regexp_count($"t", lit(Prep.PhoneRx)))
      .as[Int].collect()
    assert(redacted.forall(_ === 0))
  }

  test("packSequences: bins partition each stream contiguously under the budget cut") {
    val bins = Prep.packSequences(spark, sf, budget = 512)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(bins.nonEmpty)
    bins.groupBy(b => (b._1, b._2)).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_._3)
      // bin ids start at 0 with no gaps (holds because every test doc is
      // far under the budget), and doc ranges never interleave
      assert(sorted.head._3 === 0L)
      assert(sorted.map(_._3).toList === (0L until sorted.length).toList)
      sorted.toList.sliding(2).foreach {
        case List(a, b) => assert(a._7 < b._6,
          s"bin ${a._3} last_doc ${a._7} overlaps bin ${b._3} first_doc ${b._6}")
        case _ => ()
      }
      // concat-and-chop invariant: if a later bin exists, this bin's
      // cumulative stream offset has crossed its cut (the next doc's
      // start offset IS this cumsum, and it landed past the boundary)
      val cum = sorted.scanLeft(0L)(_ + _._5).drop(1)
      cum.init.zipWithIndex.foreach { case (c, i) =>
        assert(c >= (i + 1) * 512L, s"bin $i has a successor but never reached its cut")
      }
    }
  }

  test("cdcChunks: chunks tile each document; boundaries re-sync after an insertion") {
    val docs = graft.util.Tables.documents(spark, sf).limit(40)
      .select($"doc_id", $"text").localCheckpoint()
    val chunks = Prep.cdcChunksOf(docs)
      .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
    val texts = docs.as[(Long, String)].collect().toMap
    texts.foreach { case (id, text) =>
      val cs = chunks(id).sortBy(_._2)
      // contiguous tiling: starts/lens cover [0, n) exactly once
      assert(cs.head._3 === 0L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 === b._3, s"doc $id gap")
        case _ => ()
      }
      assert(cs.last._3 + cs.last._4 === text.length.toLong, s"doc $id tail")
      // each chunk's md5 is the md5 of the substring it claims
      val c0 = cs.head
      val expect = text.substring(c0._3.toInt, (c0._3 + c0._4).toInt)
      assert(c0._5 === java.security.MessageDigest.getInstance("MD5")
        .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    // THE content-defined property: prepend an edit; every boundary past
    // the first re-synced cut is unchanged, so almost all chunk hashes
    // are shared (a fixed-width chunker would shift every one)
    val shifted = docs.select($"doc_id",
      concat(lit("EDITED PREFIX "), $"text").as("text"))
    val shiftedChunks = Prep.cdcChunksOf(shifted)
      .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
    var shared = 0L; var total = 0L
    texts.keys.foreach { id =>
      val a = chunks(id).map(_._5).toSet
      val b = shiftedChunks(id).map(_._5).toSet
      shared += (a intersect b).size; total += a.size
    }
    assert(shared.toDouble / total > 0.8,
      s"insertion destroyed chunk identity: $shared/$total shared")
  }

  test("cdcChunks: documents shorter than the hash window emit one whole-doc chunk") {
    // sequence(window, n) is DESCENDING in Spark when n < window, and the
    // unguarded cut lambda then probed array index 0 (runtime error) and
    // negative offsets (silent wrap) — while the oracle's empty range
    // emits one whole-document chunk. The guard must match the oracle.
    val docs = Seq((1L, "x"), (2L, "ab cd"), (3L, "a" * 30), (4L, "b" * 31))
      .toDF("doc_id", "text")
    val out = Prep.cdcChunksOf(docs)
      .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
    Seq(1L -> 1, 2L -> 5, 3L -> 30).foreach { case (id, n) =>
      val cs = out(id)
      assert(cs.length === 1, s"doc $id: expected one chunk")
      assert(cs.head._3 === 0L && cs.head._4 === n.toLong,
        s"doc $id: chunk must span [0, $n)")
    }
    // the length == window doc goes through the real cut scan
    assert(out(4L).map(_._4).sum === 31L)
  }

  test("cdcIncremental: content-defined chunks re-upload far less than fixed-width") {
    val rows = Prep.cdcIncremental(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val gear = rows("cdc_gear"); val fixed = rows("fixed_64")
    // both censuses saw the same edit; sanity on shape
    assert(gear._2 > 0 && fixed._2 > 0)
    assert(gear._6 > 0L, "an edit must upload something")
    // the CDC value proposition, measured: the gear chunker's upload
    // fraction is well under the fixed-width chunker's on the same edit
    assert(gear._6 * 2 < fixed._6,
      s"gear upload ${gear._6} ppm not well under fixed ${fixed._6} ppm")
    // upload_ppm is the exact integer division it claims to be
    assert(gear._6 === gear._5 * 1000000L / gear._4)
  }

  test("chunkOverlap chunks tile the document with the configured overlap") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"n_chars").limit(20)
      .as[(Long, String, Long)].collect()
    val chunks = Prep.chunkOverlap(spark, sf, width = 200, stride = 150)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
    docs.foreach { case (id, text, nChars) =>
      val cs = chunks(id).sortBy(_._2)
      assert(cs.length === ((nChars - 1) / 150 + 1).toInt, s"doc $id chunk count")
      cs.foreach { case (_, idx, len, m) =>
        val expect = text.substring((idx * 150).toInt,
          math.min(idx * 150 + 200, nChars).toInt)
        assert(len === expect.length.toLong)
        assert(m === java.security.MessageDigest.getInstance("MD5")
          .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString,
          s"doc $id chunk $idx hash")
      }
      // consecutive chunks overlap by width - stride = 50 chars (when full)
      cs.toList.sliding(2).foreach {
        case List((_, i1, l1, _), (_, i2, _, _)) if l1 == 200L =>
          assert(i1 * 150 + 200 - i2 * 150 === 50L)
        case _ => ()
      }
    }
  }
}
