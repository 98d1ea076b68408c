package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the harness tables: replicates every table
  * `factor`x with disjoint key spaces, for large-SF bench validation
  * (`BENCH_sf1`) — the empirical check behind the repo's 100x-scale
  * claims (does AQE skew handling fire, does any build side outgrow its
  * broadcast, does any query go superlinear).
  *
  * Replication is REFERENTIALLY CONSISTENT (the same per-replica offset
  * shifts customer keys and orders' foreign keys, etc.) and similarity-
  * aware: replica texts word-suffix to `w_rN` and embeddings get a
  * deterministic per-replica directional perturbation, so cross-replica
  * near-dup/ANN pair volume does not explode quadratically — a corpus
  * 10x bigger with the SAME duplication rate, which is what a real 10x
  * corpus looks like. Dims (nation/region) stay fixed, like real dims.
  *
  * Usage: `tools/run_main.sh graft.ScaleUp /root/testdata/sf0.1 target/sf1 10`
  */
object ScaleUp {

  /** Per-replica key offset — far above any harness id. */
  val Off: Long = 1L << 33

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String, parts: Int = 32): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    def replicate(name: String, keyCols: Seq[String])(
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).map { i =>
        val shifted = keyCols.foldLeft(base)((d, c) =>
          d.withColumn(c, col(c) + lit(i * Off)))
        extra(shifted, i)
      }.reduce(_ unionAll _)
    }

    // dims stay fixed
    Seq("nation", "region").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t, parts = 1)
    }
    write(replicate("customer", Seq("c_custkey"))(), "customer")
    write(replicate("orders", Seq("o_orderkey", "o_custkey"))(), "orders")
    write(replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))(), "lineitem")
    write(replicate("part", Seq("p_partkey"))(), "part")
    write(replicate("supplier", Seq("s_suppkey"))(), "supplier")
    // ts stays raw int64 nanos (read via nanosAsLong) — Tables.events
    // converts on read, eventsBetween prunes on the raw long
    write(replicate("events", Seq("event_id", "user_id"))(), "events")
    write(replicate("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"_r$i"))), " "))
        .withColumn("n_chars", length(col("text")))
    }, "documents")
    write(replicate("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        // deterministic directional noise (±0.2 per component, varying by
        // replica and position) so cross-replica cosines drop below the
        // near-dup taus: same dup RATE as the base corpus, 10x the rows
        transform(col("embedding"), (x, pos) =>
          (x + (pmod(pos * lit(2654435761L) + lit(i * 40503L), lit(201)) - 100)
            .cast("double") / 500.0).cast("float")))
    }, "embeddings")
    spark.stop()
  }
}
