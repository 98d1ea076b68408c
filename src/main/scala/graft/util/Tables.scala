package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read the driver-generated
  * parquet directly — filters/projections placed on top of these scans are
  * pushed into the parquet reader by Catalyst (see `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`), which is the scale path: at
  * 100 TB the scan only materializes the referenced columns and row groups.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  /** The `events` table's `ts` physical encoding has changed across driver
    * regenerations: TIMESTAMP(NANOS) (read as raw Long via the legacy conf,
    * converted with exact integer division — no sub-µs component in the
    * data), plain TIMESTAMP(MICROS) without UTC adjustment (read as
    * TIMESTAMP_NTZ by Spark 4), or UTC-adjusted micros (read as TIMESTAMP).
    * All three normalize to session-TZ TimestampType here; the session TZ
    * is pinned to UTC in every entry point, so the NTZ→TZ cast is
    * instant-preserving. Every downstream query goes through this loader,
    * making it the single choke point for physical-schema drift. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }

  /** Time-range slice of `events` with the range predicate applied to the
    * RAW INT64 nanosecond column, BEFORE the timestamp conversion.
    *
    * A filter on `timestamp_micros(ts div 1000)` is a predicate on a
    * computed expression — Catalyst cannot push it into the parquet scan,
    * so every row group is read (`PushedFilters` loses the range). At
    * 100 TB that forfeits row-group min/max pruning on the dominant
    * predicate. Filtering the raw long first keeps the scan pruned; the
    * bounds are whole-second instants, so nanosecond and microsecond
    * comparisons agree exactly. */
  def eventsBetween(spark: SparkSession, dir: String,
      fromIso: String, untilIso: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    def ns(iso: String): Long = {
      val i = java.time.Instant.parse(iso)
      i.getEpochSecond * 1000000000L + i.getNano
    }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= ns(fromIso) && col("ts") < ns(untilIso))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Filter on the raw NTZ column with NTZ literals (LocalDateTime ↦
        // TimestampNTZType) so the range predicate stays a plain column
        // comparison and pushes into the parquet scan; cast AFTER filtering.
        def ntz(iso: String) = lit(
          java.time.LocalDateTime.ofInstant(java.time.Instant.parse(iso), java.time.ZoneOffset.UTC))
        raw.filter(col("ts") >= ntz(fromIso) && col("ts") < ntz(untilIso))
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        raw.filter(col("ts") >= lit(java.sql.Timestamp.from(java.time.Instant.parse(fromIso))) &&
                   col("ts") < lit(java.sql.Timestamp.from(java.time.Instant.parse(untilIso))))
    }
  }
  /** Like `events`, the corpus loaders normalize at the single choke
    * point so a driver regeneration that narrows integer widths
    * (int64→int32) or flips the embedding element type (float→double)
    * cannot break 60 queries at analysis: ids and counts pin to LONG,
    * the embedding pins to array<float> (every consumer re-casts to
    * double anyway). Trivial casts fold away in Catalyst, so the
    * already-correct encoding pays nothing. */
  /** Cast each listed column to its canonical type IF present — minimal
    * test fixtures carry a column subset, and extra driver-added columns
    * must survive untouched, so this never projects. */
  /** Strict: an incompatible regeneration (e.g. `label` arriving as a
    * non-numeric string) must fail LOUDLY at the choke point, not null
    * out and corrupt everything downstream. Already-canonical columns
    * skip the guard entirely at plan-build time (schema comparison, so
    * the common case adds NOTHING to the plan — Catalyst does not fold
    * the isNotNull∧isNull contradiction itself); drifted encodings get
    * try_cast + raise_error on any non-null value that casts to null. */
  private def normalize(df: DataFrame, canon: (String, String)*): DataFrame =
    canon.foldLeft(df) { case (d, (c, t)) =>
      val want = org.apache.spark.sql.types.DataType.fromDDL(t)
      if (!d.columns.contains(c) ||
          d.schema(d.schema.fieldIndex(c)).dataType.catalogString ==
            want.catalogString) d
      else d.withColumn(c,
        when(col(c).isNotNull && col(c).try_cast(t).isNull,
          raise_error(concat_ws("", lit(s"[graft] schema drift: $c="),
            col(c).cast("string"), lit(s" does not cast to $t"))).cast(t))
        .otherwise(col(c).try_cast(t)))
    }

  def documents(spark: SparkSession, dir: String): DataFrame =
    normalize(apply(spark, dir, "documents"),
      "doc_id" -> "long", "n_chars" -> "long")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    normalize(apply(spark, dir, "embeddings"),
      "vec_id" -> "long", "embedding" -> "array<float>", "label" -> "int")
}
