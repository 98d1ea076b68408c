package graft

import java.nio.file.Files

import graft.sink.Layout
import graft.util.Tables

class LayoutSpec extends SparkSpec {

  test("date+bucket layout: range reads prune partitions, results match a full scan") {
    val dir = Files.createTempDirectory("layout"); dir.toFile.deleteOnExit()
    val ev = Tables.events(spark, sf)
    Layout.writePartitioned(ev, dir.toString, "ts", Seq("user_id"), nBuckets = 8)

    val ranged = Layout.readDateRange(spark, dir.toString, "2024-01-10", "2024-01-15")
    // partition pruning visible in the plan, not just the row count
    val plan = ranged.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("p_date"), plan)

    val expected = ev.filter("ts >= '2024-01-10' AND ts < '2024-01-15'").count()
    assert(ranged.count() === expected)

    // per-key read: prunes to one bucket, returns exactly that key's rows
    val key7 = Layout.readKey(spark, dir.toString, Seq("user_id"), Seq(7L), nBuckets = 8)
    assert(key7.count() === ev.filter("user_id = 7").count())
    val files = ranged.select(org.apache.spark.sql.functions
      .input_file_name()).distinct().count()
    val allFiles = spark.read.parquet(dir.toString)
      .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    assert(files < allFiles, s"range read touched all $allFiles files")
  }

  test("bucketed tables join with zero shuffle") {
    val ev = Tables.events(spark, sf)
    Layout.writeBucketed(ev.select("event_id", "user_id", "value"),
      "ev_bucketed_a", Seq("user_id"), nBuckets = 4)
    Layout.writeBucketed(ev.select("event_id", "user_id", "event_type"),
      "ev_bucketed_b", Seq("user_id"), nBuckets = 4)
    val joined = spark.table("ev_bucketed_a")
      .join(spark.table("ev_bucketed_b"), "user_id")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(joined.count() ===
      ev.select("event_id", "user_id").as("a")
        .join(ev.select("event_id", "user_id").as("b"), "user_id").count())
  }
}
