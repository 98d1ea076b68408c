package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Multiplex sink: route each entity batch to its table by schema probe,
  * writing with upsert-by-primary-key semantics.
  *
  * Mirrors the reference's `foreachBatch` sink (`spark-streaming.py:
  * 119-149`): it probes which columns exist to pick the Cassandra table
  * (`"id" in df.columns → coins`, ...), and relies on Cassandra's
  * last-write-wins PK upsert for dedup (load-bearing there because the
  * stream replays from `earliest` with no checkpoint — SURVEY.md §1.1).
  * We model that explicitly: `keepLatest` over the PK before the write,
  * with newer batches winning ties.
  *
  * Note: the reference's routing has a dead branch — `ema_20` can never
  * be reached after the `sma_20` probe (`spark-streaming.py:131`); we
  * keep one probe per table and document rather than reproduce the dead
  * code.
  *
  * Scale notes: this local implementation rewrites the table because the
  * harness storage is plain parquet. At cluster scale the same semantics
  * are a MERGE INTO / dynamic-partition-overwrite keyed by
  * (key-hash bucket, date): the union+keepLatest plan is unchanged, only
  * the final write targets the partitions that received keys.
  */
object Router {

  /** Primary keys per table (reference DDL `spark-streaming.py:52-115`). */
  val TableKeys: Map[String, Seq[String]] = Map(
    "coins" -> Seq("id"),
    "price_data" -> Seq("coin_id", "exchange", "timestamp"),
    "ohlc_data" -> Seq("coin_id", "exchange", "timestamp", "timeframe"),
    "technical_indicators" -> Seq("coin_id", "exchange", "timestamp"),
    "coin_market_cap" -> Seq("coin_symbol", "timestamp"))

  /** Column-presence probe → table name (K1). */
  def route(df: DataFrame): Option[String] = {
    val cols = df.columns.toSet
    if (cols.contains("id")) Some("coins")
    else if (cols.contains("sma_20")) Some("technical_indicators")
    else if (cols.contains("open")) Some("ohlc_data")
    else if (cols.contains("price")) Some("price_data")
    else if (cols.contains("market_cap_percentage")) Some("coin_market_cap")
    else None
  }

  /** Upsert `batch` into `baseDir/<table>`: last-write-wins on the PK,
    * newer batch beats stored rows on exact PK collision; within one
    * batch, ties on the PK are broken deterministically by the remaining
    * columns (descending) so re-running the same input stores the same
    * row regardless of partition order. */
  def upsert(spark: SparkSession, batch: DataFrame, table: String,
      baseDir: String): Unit = {
    val keys = TableKeys(table)
    val dest = s"$baseDir/$table"
    val old = s"$baseDir/.$table.old"
    val tmp = s"$baseDir/.$table.tmp"
    // crash recovery: a previous upsert may have died between the
    // rename-aside and the tmp->dest move — the .old dir is then the
    // authoritative table
    if (!Files.exists(Paths.get(dest)) && Files.exists(Paths.get(old)))
      Files.move(Paths.get(old), Paths.get(dest))
    deleteTree(old); deleteTree(tmp)

    val incoming = batch.withColumn("__pri", lit(1))
    val tiebreak = incoming.columns.filterNot(c => keys.contains(c) || c == "__pri")
      .map(c => col(c).desc).toSeq
    val merged =
      if (Files.exists(Paths.get(dest))) {
        val existing = spark.read.parquet(dest).withColumn("__pri", lit(0))
        Dedup.keepLatest(incoming.unionByName(existing), keys,
          col("__pri").desc +: tiebreak)
      } else {
        Dedup.keepLatest(incoming, keys, col("__pri").desc +: tiebreak)
      }
    merged.drop("__pri").write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: the merged plan reads `dest`, so tmp must be fully
    // materialized first; renaming dest aside (instead of deleting it)
    // keeps a recoverable copy at every instant of the swap
    if (Files.exists(Paths.get(dest))) Files.move(Paths.get(dest), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(dest))
    deleteTree(old)
  }

  private def deleteTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }

  /** Route + upsert each entity frame of a micro-batch. Unroutable frames
    * are ignored (the reference logs and continues,
    * `spark-streaming.py:144-147`). */
  def writeBatch(spark: SparkSession, baseDir: String, frames: Seq[DataFrame]): Unit =
    frames.foreach { df =>
      route(df).foreach(table => upsert(spark, df, table, baseDir))
    }
}
