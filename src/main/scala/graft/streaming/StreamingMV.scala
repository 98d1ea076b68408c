package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming materialized-view maintenance: a per-user aggregate kept
  * current by merging each micro-batch's partial aggregate into stored
  * state — the streaming twin of the batch
  * [[graft.queries.Analytics.incrementalAgg]], with the same
  * decomposable-exact algebra (counts and integer-cents sums add,
  * epoch-µs min/max fold).
  *
  * State layout is generation-versioned parquet: `gen=<batchId>`
  * directories, newest wins. A merge for batch B reads the newest
  * generation with id < B (the state as of before B), adds B's partial,
  * and writes `gen=B`. That read-below-own-id rule is what makes replay
  * IDEMPOTENT: when Structured Streaming re-delivers a batch after a
  * crash, the retry reads the same pre-state the failed attempt read and
  * overwrites the same generation — no double counting, exactly-once
  * state without a transaction log. (A lakehouse table format does the
  * same thing with a commit log; generations are the minimal parquet
  * expression of it, and old generations double as time travel.)
  *
  * Scale: each merge touches the running aggregate (one row per key) and
  * the new delta — never re-scans history. The union+re-agg shuffles
  * only |keys| + |batch keys| rows.
  */
object StreamingMV {

  /** The decomposable per-user partial of one slice of events.
    * Columns in: (event_id, user_id, ts, value). */
  def partial(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"))

  /** Algebraic merge of two partials (associative + commutative). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("first_us")).as("first_us"),
        max(col("last_us")).as("last_us"))

  private def generations(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
  }

  /** The newest materialized state strictly below `belowGen`
    * (Long.MaxValue = just the newest). None before the first merge. */
  def readState(spark: SparkSession, stateDir: String,
      belowGen: Long = Long.MaxValue): Option[DataFrame] =
    generations(spark, stateDir).filter(_ < belowGen)
      .sorted.lastOption
      .map(g => spark.read.parquet(s"$stateDir/gen=$g"))

  /** Merge one micro-batch into the state dir (the foreachBatch body). */
  def mergeBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val delta = partial(batch)
    val next = readState(batch.sparkSession, stateDir, belowGen = batchId)
      .map(prev => merge(prev, delta)).getOrElse(delta)
    next.write.mode("overwrite").parquet(s"$stateDir/gen=$batchId")
  }

  /** Attach the maintenance loop to a stream of events. */
  def attach(events: DataFrame, stateDir: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (df: DataFrame, id: Long) =>
        mergeBatch(df, stateDir, id)
      }
      .start()

  /** Oracle gate (q_mv_replay): batch-mode replay of the maintenance
    * loop against DuckDB — the q_state_v2 pattern applied to the MV
    * family. Events are split into 5 deterministic slices
    * (pmod(event_id, 5)), merged in order, and two batches are
    * RE-DELIVERED (the crash-retry twin): batch 2 after later batches
    * exist, and batch 4 — the final generation — immediately after its
    * first delivery. The read-below-own-id rule makes both retries
    * overwrite their own generation from the same pre-state; if a retry
    * ever read the newest state instead, batch 4 would double-count and
    * the hash against the one-shot DuckDB aggregate would fail. The
    * output is the final materialized state plus the generation count
    * (5 — retries overwrite, never append). */
  def replayGate(spark: SparkSession, dir: String): DataFrame = {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_mv_gate").toString
    val ev = graft.util.Tables.events(spark, dir)
    val slices = (0 until 5).map(i =>
      ev.filter(pmod(col("event_id"), lit(5)) === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      mergeBatch(b, stateDir, i.toLong)
      if (i == 4) mergeBatch(b, stateDir, i.toLong) // retry of the tail batch
    }
    mergeBatch(slices(2), stateDir, 2L) // late retry of a mid batch
    val nGens = generations(spark, stateDir).length.toLong
    readState(spark, stateDir).get
      .withColumn("n_gens", lit(nGens))
      .orderBy(col("user_id"))
  }
}
