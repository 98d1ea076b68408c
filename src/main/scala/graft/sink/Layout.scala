package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for fact tables at scale: date-partitioned,
  * key-hash sub-partitioned, key-sorted within files.
  *
  * The reference stores facts keyed `((coin, exchange), ts DESC)` in
  * Cassandra and then full-scans around that layout (`ALLOW FILTERING`,
  * SURVEY.md §4). This is the parquet-native equivalent done right:
  *
  *   - `p_date=YYYY-MM-DD` directory partitioning → time-range queries
  *     prune whole partitions before any IO (`PartitionFilters` in the
  *     scan, asserted in LayoutSpec);
  *   - `p_bucket = hash(key) % n` sub-partitioning → a per-key query
  *     touches one bucket per day, and two tables bucketed the same way
  *     join co-located after AQE;
  *   - `sortWithinPartitions(key, ts)` → parquet row-group stats make
  *     per-key reads skip most pages, and downstream window functions
  *     over (key, ts) often avoid a re-sort.
  *
  * At 100 TB this layout is what turns the dashboard queries from
  * full scans into partition-pruned, page-skipped reads.
  */
object Layout {

  /** Write `df` date-partitioned on `tsCol` and hash-bucketed on
    * `keyCols` into `nBuckets` sub-partitions. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      tsCol: String,
      keyCols: Seq[String],
      nBuckets: Int = 16): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .withColumn("p_bucket", pmod(hash(keyCols.map(col): _*), lit(nBuckets)))
      .repartition(col("p_date"), col("p_bucket"))
      .sortWithinPartitions((keyCols :+ tsCol).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_date", "p_bucket")
      .parquet(path)

  /** Read back with a date range that prunes at the partition level. */
  def readDateRange(spark: SparkSession, path: String,
      fromDate: String, untilDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("p_date") >= lit(fromDate) && col("p_date") < lit(untilDate))

  /** Write as a true bucketed table (Hive-style bucketing metadata via
    * the session catalog): joins and aggregations between tables bucketed
    * the same way on the same keys need NO shuffle at all — the single
    * biggest lever for repeated big⋈big joins at 100 TB. Verified
    * shuffle-free in LayoutSpec. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      keyCols: Seq[String],
      nBuckets: Int = 16): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(tableName)

  /** Read one key's slice: date partitions pruned by range, bucket
    * partitions pruned by the key hash. */
  def readKey(spark: SparkSession, path: String, keyCols: Seq[String],
      keyValues: Seq[Any], nBuckets: Int = 16): DataFrame = {
    val df = spark.read.parquet(path)
    val bucket = pmod(hash(keyValues.map(lit): _*), lit(nBuckets))
    keyCols.zip(keyValues)
      .foldLeft(df.filter(col("p_bucket") === bucket)) {
        case (d, (c, v)) => d.filter(col(c) === lit(v))
      }
  }
}
