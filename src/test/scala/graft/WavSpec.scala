package graft

import javax.sound.sampled.AudioSystem

import graft.ops.Multimodal

/** The WAV path is real: [[Multimodal.wavTable]] must emit files the
  * JDK's javax.sound.sampled WAV reader accepts with the advertised
  * format, and [[Multimodal.wavDecode]]'s column-algebra parse must
  * reproduce the signed PCM16 samples that codec yields — including
  * two's-complement reassembly of negative values. */
class WavSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloads: Map[Long, Array[Byte]] =
    Multimodal.wavTable(spark, sf, maxDocId = 48)
      .as[(Long, Array[Byte])].collect().toMap

  private def codecSamples(bytes: Array[Byte]): Array[Int] = {
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(fmt.getSampleRate === 8000f)
    val raw = in.readAllBytes()
    raw.grouped(2).map { b =>
      val v = (b(0) & 0xff) | ((b(1) & 0xff) << 8)
      if (v >= 32768) v - 65536 else v
    }.toArray
  }

  test("generated WAVs decode with javax.sound.sampled (a real codec)") {
    assert(payloads.nonEmpty)
    payloads.foreach { case (id, bytes) =>
      assert(codecSamples(bytes).length === (id % 64 + 16).toInt,
        s"doc $id sample count")
    }
    // the generator emits negatives, so two's complement is exercised
    assert(payloads.values.exists(b => codecSamples(b).exists(_ < 0)))
  }

  test("column-algebra decode agrees with javax.sound.sampled sample-for-sample") {
    val engine = Multimodal.wavDecode(payloads.toSeq.toDF("doc_id", "payload"))
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    payloads.foreach { case (id, bytes) =>
      val s = codecSamples(bytes)
      val (_, rate, n, sum, sumAbs, maxAbs, sumSq) = engine(id)
      assert(rate === 8000L)
      assert(n === s.length.toLong)
      assert(sum === s.map(_.toLong).sum)
      assert(sumAbs === s.map(v => math.abs(v.toLong)).sum)
      assert(maxAbs === s.map(v => math.abs(v.toLong)).max)
      assert(sumSq === s.map(v => v.toLong * v).sum, s"doc $id sum of squares")
    }
  }

  test("decode rejects payloads that violate the PCM16 mono contract") {
    val junk = Seq(
      (1L, "RIFFxxxxJUNK".getBytes("UTF-8")),
      (2L, "definitely not audio".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    assert(Multimodal.wavDecode(junk).count() === 0L)
  }

  test("frame energies agree with a plain-Scala pass over codec samples") {
    val engine = Multimodal.wavFrames(spark, sf)
      .filter($"doc_id" < 48)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    payloads.foreach { case (id, bytes) =>
      val frames = codecSamples(bytes).zipWithIndex
        .groupBy(_._2 / 20).toSeq
        .map { case (f, xs) =>
          (f.toLong, xs.map(x => x._1.toLong * x._1).sum,
            xs.map(x => math.abs(x._1).toLong).max)
        }
      val (tf, te, tp) = frames.maxBy(fr => (fr._2, -fr._1)) match {
        case (f, e, p) => (f, e, p)
      }
      assert(engine(id) === ((id, frames.length.toLong,
        frames.map(_._2).sum, tf, te, tp)), s"doc $id")
    }
  }
}
