package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Change-data-capture / lakehouse maintenance operators over the
  * `events` log, modeling the table-maintenance half of an ingestion
  * pipeline (the reference materializes upserts into Cassandra,
  * `spark-streaming.py`; here the same last-write-wins semantics are
  * expressed as batch MERGE / snapshot reconstruction plans).
  *
  * Op-code derivation (deterministic, from the event type):
  * `signup` → I, `error` → D, everything else → U. Values are carried in
  * exact integer cents so Spark and the DuckDB oracle agree bit-for-bit.
  *
  * Scale notes:
  *   - [[cdcMerge]] joins a *small* change window against a *large* base
  *     snapshot. The changes side is reduced to one row per key BEFORE the
  *     join (latest-op-wins window over just the CDC slice). Spark cannot
  *     broadcast a full-outer join, so the merge is a key-partitioned
  *     sort-merge — at 100 TB the base snapshot would be stored bucketed
  *     by key, making its side of the merge exchange-free; the reduced
  *     changes side is tiny by construction (a few-hour CDC window).
  *   - [[timeTravel]] reconstructs the as-of-T state by pruning the scan
  *     to `ts < T` FIRST (row-group min/max pruning via the raw int64
  *     range path in [[Tables.eventsBetween]]) and taking the latest row
  *     per key from the pruned slice — never by materializing all SCD2
  *     version windows and filtering them afterwards.
  */
object Cdc {

  private val evOrder = Seq(col("ts"), col("event_id"))

  /** Event-value in exact integer cents. */
  private def cents = round(col("value") * 100).cast("long")

  /** CDC op code for a log row. */
  private def opCode = when(col("event_type") === "signup", "I")
    .when(col("event_type") === "error", "D")
    .otherwise("U")

  /** Latest surviving state per key from a log slice: one row per
    * user_id, with the op/value of its last row (ts, event_id order) and
    * the slice's row count for that key. */
  private def latestState(slice: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(evOrder.map(_.desc): _*)
    slice
      .select(col("user_id"), opCode.as("op"), cents.as("cents"),
        row_number().over(w).as("__rn"),
        count(lit(1)).over(Window.partitionBy(col("user_id"))).as("n_ops"))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Batch MERGE: apply the CDC window `[t0, t1)` onto the base snapshot
    * (state as of t0). Inserts/updates take the change value, deletes
    * drop the key, untouched keys keep their base value. Returns the
    * post-merge snapshot: (user_id, cents, src, n_changes).
    */
  def cdcMerge(spark: SparkSession, dir: String,
      t0: String = "2024-01-15T00:00:00Z",
      t1: String = "2024-01-23T00:00:00Z"): DataFrame = {
    val origin = "2024-01-01T00:00:00Z"
    // Base snapshot: latest surviving row per key strictly before t0.
    // (At production scale this is a stored table, not a derived window.)
    val base = latestState(Tables.eventsBetween(spark, dir, origin, t0))
      .filter(col("op") =!= "D")
      .select(col("user_id"), col("cents").as("base_cents"))
    // Change set: latest op per key within [t0, t1) — reduced to one row
    // per key BEFORE the join, then broadcast (small by construction: a
    // few-hour CDC window vs the full history).
    val changes = latestState(Tables.eventsBetween(spark, dir, t0, t1))
      .select(col("user_id"), col("op"), col("cents").as("chg_cents"),
        col("n_ops").as("n_changes"))
    base
      .join(changes, Seq("user_id"), "full_outer")
      // delete wins; insert/update takes the change value; no change keeps base
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        col("user_id"),
        coalesce(col("chg_cents"), col("base_cents")).as("cents"),
        when(col("op").isNotNull, lit("cdc")).otherwise(lit("base")).as("src"),
        coalesce(col("n_changes"), lit(0L)).as("n_changes"))
      .orderBy(col("user_id"))
  }

  /** DuckDB oracle for [[cdcMerge]] — same windows, same op mapping. */
  val cdcMergeSql: String =
    """WITH log AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
      |         ELSE 'U' END AS op,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |base_last AS (
      |  SELECT user_id, op, cents,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM log WHERE ts < TIMESTAMP '2024-01-15 00:00:00'),
      |base AS (
      |  SELECT user_id, cents AS base_cents FROM base_last
      |  WHERE rn = 1 AND op <> 'D'),
      |chg_rows AS (
      |  SELECT user_id, op, cents,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_ops
      |  FROM log
      |  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      |    AND ts <  TIMESTAMP '2024-01-23 00:00:00'),
      |chg AS (
      |  SELECT user_id, op, cents AS chg_cents, n_ops AS n_changes
      |  FROM chg_rows WHERE rn = 1)
      |SELECT user_id,
      |  coalesce(chg_cents, base_cents) AS cents,
      |  CASE WHEN op IS NOT NULL THEN 'cdc' ELSE 'base' END AS src,
      |  CAST(coalesce(n_changes, 0) AS BIGINT) AS n_changes
      |FROM base FULL JOIN chg USING (user_id)
      |WHERE op IS NULL OR op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** As-of-T snapshot reconstruction: per (user_id, event_type) entity,
    * the value in force at instant T, its version number (count of rows
    * up to T), and when it became valid. The `ts < T` predicate is pushed
    * into the parquet scan (raw int64 range in [[Tables.eventsBetween]]),
    * so only pre-T row groups are read — the complement of
    * `Analytics.scd2`-then-filter, which would window the full history.
    */
  def timeTravel(spark: SparkSession, dir: String,
      t: String = "2024-01-20T00:00:00Z"): DataFrame = {
    val origin = "2024-01-01T00:00:00Z"
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(evOrder.map(_.desc): _*)
    Tables.eventsBetween(spark, dir, origin, t)
      .select(col("user_id"), col("event_type"), cents.as("cents"),
        col("ts").as("valid_from"),
        row_number().over(w).as("__rn"),
        count(lit(1)).over(
          Window.partitionBy(col("user_id"), col("event_type")))
          .as("version"))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .orderBy(col("user_id"), col("event_type"))
  }

  /** DuckDB oracle for [[timeTravel]]. */
  val timeTravelSql: String =
    """WITH pre AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id, event_type) AS version
      |  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
      |SELECT user_id, event_type, cents, ts AS valid_from,
      |  CAST(version AS BIGINT) AS version
      |FROM pre WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin
}
