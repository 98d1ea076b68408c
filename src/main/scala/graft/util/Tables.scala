package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's µs-precision TimestampType rejects outright. We read nanos as
    * raw Long (legacy conf) and convert with exact integer division — the
    * driver data carries no sub-µs component (checked: 0 rows at sf0.01),
    * so this is lossless. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
    if (raw.schema("ts").dataType == LongType)
      raw.filter(col("ts") >= ns(fromIso) && col("ts") < ns(untilIso))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      raw.filter(col("ts") >= lit(java.sql.Timestamp.from(java.time.Instant.parse(fromIso))) &&
                 col("ts") < lit(java.sql.Timestamp.from(java.time.Instant.parse(untilIso))))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
