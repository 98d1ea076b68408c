package graft

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** The BMP path is real: [[Multimodal.bmpTable]] must emit files a
  * battle-tested codec (the JDK's javax.imageio BMP reader) accepts, and
  * [[Multimodal.bmpDecode]]'s column-algebra parse must agree with that
  * codec pixel-for-pixel — width/height, channel sums, and the
  * position-weighted sum that any stride/padding/bottom-up mistake
  * shifts. Doc ids cover width 1..16, so every 4-byte row-padding case
  * (3w mod 4 = 0,1,2,3) is exercised. */
class BmpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloads: Map[Long, Array[Byte]] =
    Multimodal.bmpTable(spark, sf, maxDocId = 64)
      .as[(Long, Array[Byte])].collect().toMap

  test("generated BMPs decode with javax.imageio (a real codec)") {
    assert(payloads.nonEmpty)
    payloads.foreach { case (id, bytes) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejected the payload")
      assert(img.getWidth === (id % 16 + 1).toInt)
      assert(img.getHeight === (id % 12 + 1).toInt)
    }
  }

  test("column-algebra decode agrees with javax.imageio pixel-for-pixel") {
    val engine = Multimodal.bmpDecode(
        payloads.toSeq.toDF("doc_id", "payload"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    payloads.foreach { case (id, bytes) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var (sr, sg, sb, wr) = (0L, 0L, 0L, 0L)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        sr += r
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        wr += (y.toLong * img.getWidth + x + 1) * r
      }
      val (_, w, h, npx, esr, esg, esb, ewr) = engine(id)
      assert((w, h, npx) ===
        (img.getWidth.toLong, img.getHeight.toLong,
          img.getWidth.toLong * img.getHeight))
      assert((esr, esg, esb, ewr) === ((sr, sg, sb, wr)),
        s"doc $id: engine decode disagrees with ImageIO")
    }
  }

  test("decode rejects payloads that are not 24bpp BMPs") {
    val junk = Seq(
      (1L, "not an image at all".getBytes("UTF-8")),
      (2L, Array[Byte](0x42, 0x4d, 0, 0, 0, 0)) // magic but truncated header
    ).toDF("doc_id", "payload")
    // junk rows fail the magic/bpp contract filter and simply drop out
    assert(Multimodal.bmpDecode(junk).count() === 0L)
  }

  test("2x2 thumbnail agrees with a plain-Scala box filter over javax.imageio pixels") {
    val engine = Multimodal.bmpThumb(spark, sf)
      .filter($"doc_id" < 64)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    payloads.foreach { case (id, bytes) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val ow = (w + 1) / 2
      val oh = (h + 1) / 2
      val sums = scala.collection.mutable.Map[(Int, Int), (Long, Long, Long, Long)]()
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val k = (y / 2, x / 2)
        val (r0, g0, b0, n0) = sums.getOrElse(k, (0L, 0L, 0L, 0L))
        sums(k) = (r0 + ((rgb >> 16) & 0xff), g0 + ((rgb >> 8) & 0xff),
          b0 + (rgb & 0xff), n0 + 1)
      }
      var (tr, tg, tb, twr) = (0L, 0L, 0L, 0L)
      sums.foreach { case ((cy, cx), (r0, g0, b0, n0)) =>
        tr += r0 / n0; tg += g0 / n0; tb += b0 / n0
        twr += (cy.toLong * ow + cx + 1) * (r0 / n0)
      }
      assert(engine(id) === ((id, ow.toLong, oh.toLong, sums.size.toLong,
        tr, tg, tb, twr)), s"doc $id")
    }
  }

  test("imagePhash matches an ImageIO-decoded dHash; buckets count exact hash dups") {
    val g = 4
    val out = Multimodal.imagePhash(spark, sf)
      .filter($"doc_id" < 64)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // only images at least grid-sized carry a hash
    val expectIds = payloads.keySet.filter(id =>
      (id % 16 + 1) >= g && (id % 12 + 1) >= g)
    assert(out.keySet === expectIds)
    out.foreach { case (id, (_, w, h, phash, _)) =>
      val img = ImageIO.read(
        new java.io.ByteArrayInputStream(payloads(id)))
      assert((w, h) === ((img.getWidth.toLong, img.getHeight.toLong)))
      // independent dHash: area-mapped 4x4 integer-luma thumbnail
      val cell = Array.fill(g, g)((0L, 0L)) // (graySum, n)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val (ci, cj) = (x * g / img.getWidth, y * g / img.getHeight)
        val (s0, n0) = cell(cj)(ci); cell(cj)(ci) = (s0 + gray, n0 + 1)
      }
      val cg = cell.map { row => row.map { case (s0, n0) => s0 / n0 } }
      var expect = 0L
      for (i <- 0 until g; j <- 0 until g - 1)
        if (cg(i)(j) > cg(i)(j + 1)) expect |= 1L << (i * (g - 1) + j)
      for (i <- 0 until g - 1; j <- 0 until g)
        if (cg(i)(j) > cg(i + 1)(j)) expect |= 1L << (g * (g - 1) + i * g + j)
      assert(phash === expect, s"doc $id")
    }
    // bucket sizes: exact count of equal hashes in the FULL gated slice
    val full = Multimodal.imagePhash(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byHash = full.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    full.foreach { case (id, _, _, ph, bs) =>
      assert(bs === byHash(ph), s"doc $id bucket")
    }
  }
}
