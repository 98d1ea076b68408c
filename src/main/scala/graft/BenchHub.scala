package graft

import org.apache.spark.sql.SparkSession

/** Machine-readable record of the hub-shingle crossover (the r10 proof
  * that PPJoin's prefix filter exists for hubbed corpora): times the
  * naive shingle self-join against the prefix-filtered twin (and the
  * containment pair) on a hub-free rung and a 2%-hub rung of the SAME
  * size, plus the census chooser's decision on each — so the
  * "selection is a corpus property" claim ships as a re-runnable
  * artifact (BENCH_hub.json), not prose.
  *
  * Usage: tools/run_main.sh graft.BenchHub <hubFreeDir> <hubDir>
  * (defaults target/sf10, target/sf10hub). One JSON line on stdout. */
object BenchHub {
  def main(args: Array[String]): Unit = {
    val freeDir = if (args.length > 0) args(0) else "target/sf10"
    val hubDir = if (args.length > 1) args(1) else "target/sf10hub"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val out = new StringBuilder
    out.append("{\"metric\":\"hub_crossover\",\"unit\":\"sec\",\"dirs\":{")
    val dirJson = Seq("hub_free" -> freeDir, "hubbed" -> hubDir).map {
      case (tag, dir) =>
        val choosePrefix = graft.ops.Dedup.prefixPathWins(spark, dir)
        val tNaive = time(graft.ops.Dedup.jaccardPairs(spark, dir))
        val tPrefix = time(graft.ops.Dedup.jaccardPairsPrefix(spark, dir))
        val tContain = time(graft.ops.Dedup.containmentPairs(spark, dir))
        val tContainPre = time(graft.ops.Dedup.containmentPairsPrefix(spark, dir))
        f"""\"$tag\":{\"dir\":\"$dir\",\"chooser_picks_prefix\":$choosePrefix,""" +
          f"""\"q_dedup_jaccard\":$tNaive%.1f,\"q_dedup_ppjoin\":$tPrefix%.1f,""" +
          f"""\"q_containment\":$tContain%.1f,\"q_containment_prefix\":$tContainPre%.1f}"""
    }
    out.append(dirJson.mkString(","))
    out.append("}}")
    println(out.toString)
    spark.stop()
  }
}
