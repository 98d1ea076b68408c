package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.StreamIvf

/** IVF maintenance: the batch drift report must be internally
  * consistent, the trigger must respond to the threshold in both
  * directions, and the STREAMING occupancy census over the delta feed
  * (StreamIvf, same 1e-3 quantization) must reproduce the batch
  * n_delta column bit-for-bit — the live half of the re-train loop. */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val report =
    Similarity.ivfMaintenance(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Boolean, Long)].collect()

  test("occupancy censuses partition the corpus and shares are exact") {
    val n = graft.util.Tables.embeddings(spark, sf).count()
    assert(report.map(_._2).sum + report.map(_._3).sum === n,
      "base + delta occupancy must partition the corpus")
    assert(report.map(_._8).sum === n,
      "post-maintenance occupancy must cover the full corpus")
    val totBase = report.map(_._2).sum
    val totDelta = report.map(_._3).sum
    report.foreach { case (_, nb, nd, bppm, dppm, drift, _, _) =>
      assert(bppm === nb * 1000000L / totBase)
      assert(dppm === nd * 1000000L / totDelta)
      assert(drift === math.abs(dppm - bppm))
    }
  }

  test("the re-train trigger is global and threshold-monotone") {
    assert(report.map(_._7).distinct.length === 1,
      "retrain is one decision for the whole index, not per bucket")
    val maxDrift = report.map(_._6).max
    val always = Similarity.ivfMaintenance(spark, sf,
      driftThresholdPpm = -1L).as[(Long, Long, Long, Long, Long, Long, Boolean, Long)]
      .collect()
    assert(always.forall(_._7), "threshold below any drift must trigger")
    val never = Similarity.ivfMaintenance(spark, sf,
      driftThresholdPpm = maxDrift).as[(Long, Long, Long, Long, Long, Long, Boolean, Long)]
      .collect()
    assert(never.forall(!_._7), "threshold at the max drift must not trigger")
  }

  test("retrain-gain recall: probing all buckets is exact, fewer is monotone") {
    val p2 = Similarity.ivfRetrainGain(spark, sf, nprobe = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val p8 = Similarity.ivfRetrainGain(spark, sf, nprobe = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(p8.forall(r => r._2 == 10L && r._3 == 10L),
      "nprobe = nlist probes every bucket: IVF must equal brute force")
    // candidates(2 probes) ⊆ candidates(8 probes) and ground-truth
    // members always outrank non-members, so recall is monotone
    p2.zip(p8).foreach { case ((id, s2, n2), (_, s8, n8)) =>
      assert(s2 <= s8 && n2 <= n8, s"query $id recall not monotone in nprobe")
    }
  }

  test("streaming occupancy over the delta feed reproduces the batch census") {
    val (half, _, cBaseDf) = Similarity.ivfStaleParts(spark, sf)
    // k·d bounded: the same closure-sized state StreamIvf broadcasts
    val cents: Seq[(Long, Seq[Long])] = cBaseDf
      .groupBy($"centroid_id")
      .agg(array_sort(collect_list(struct($"pos", $"cx"))).as("pc"))
      .select($"centroid_id", expr("transform(pc, p -> p.cx)").as("cv"))
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    val delta = graft.util.Tables.embeddings(spark, sf)
      .filter($"vec_id" >= half)
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamIvf.bucketCounts(
        in.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", $"embedding".cast("array<float>")),
        cents, quant = 1000L)
      .writeStream.format("memory").queryName("ivf_maint_out")
      .outputMode("complete").start()
    val live = try {
      // two micro-batches: the census must not depend on arrival order
      in.addData(delta.take(delta.length / 2)); q.processAllAvailable()
      in.addData(delta.drop(delta.length / 2)); q.processAllAvailable()
      spark.table("ivf_maint_out").as[(Long, Long)].collect().toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ivf_maint_out")
    }
    val batch = report.filter(_._3 > 0).map(r => r._1 -> r._3).toMap
    assert(live === batch,
      "live delta occupancy must equal the batch gate's n_delta column")
    // and the live census reaches the same re-train decision
    val totBase = report.map(_._2).sum
    val totDelta = report.map(_._3).sum
    val liveDrift = report.map { case (id, nb, _, _, _, _, _, _) =>
      math.abs(live.getOrElse(id, 0L) * 1000000L / totDelta -
        nb * 1000000L / totBase)
    }.max
    assert((liveDrift > 20000L) === report.head._7)
  }
}
