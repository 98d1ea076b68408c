package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Cdc, Skew}
import graft.queries.Analytics
import graft.util.Tables

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("cdcMerge equals replaying the whole log up to t1") {
    // Applying the [t0, t1) change window onto the as-of-t0 base must give
    // the same surviving (key, value) state as a single latest-op-wins
    // pass over the full log < t1 — merge correctness, independent of the
    // base/changes split point.
    val t1 = "2024-01-23T00:00:00Z"
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val replay = Tables.eventsBetween(spark, sf, "2024-01-01T00:00:00Z", t1)
      .select($"user_id",
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D").otherwise("U").as("op"),
        round($"value" * 100).cast("long").as("cents"),
        row_number().over(w).as("rn"))
      .filter($"rn" === 1 && $"op" =!= "D")
      .select($"user_id", $"cents")
      .as[(Long, Long)].collect().sortBy(_._1)
    val merged = Cdc.cdcMerge(spark, sf)
      .select($"user_id", $"cents")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(merged.toSeq === replay.toSeq)
  }

  test("cdcMerge: a key whose last change is D is absent; src reflects provenance") {
    val out = Cdc.cdcMerge(spark, sf)
      .select($"user_id", $"src", $"n_changes").as[(Long, String, Long)].collect()
    // provenance: every key with changes is marked cdc and counts them
    assert(out.forall { case (_, s, n) => (s == "cdc") == (n > 0) })
    // deletes really drop keys: recompute the last-op map and check
    val lastOp = Tables.eventsBetween(
        spark, sf, "2024-01-15T00:00:00Z", "2024-01-23T00:00:00Z")
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id",
        when($"event_type" === "error", "D").otherwise("x").as("op"))
      .as[(Long, String)].collect().toMap
    val deleted = lastOp.collect { case (k, "D") => k }.toSet
    assert(deleted.nonEmpty, "fixture should exercise the delete path")
    assert(out.map(_._1).toSet.intersect(deleted).isEmpty)
  }

  test("timeTravel matches scd2-style validity-window filtering") {
    // The pruned-scan reconstruction must equal the naive plan: build all
    // SCD2 windows, keep the one containing T.
    val t = lit("2024-01-20 00:00:00").cast("timestamp")
    val naive = Analytics.scd2(spark, sf)
      .filter($"valid_from" <= t && ($"valid_to".isNull || $"valid_to" > t))
      .select($"user_id", $"event_type", round($"value" * 100).cast("long"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    val fast = Cdc.timeTravel(spark, sf)
      .select($"user_id", $"event_type", $"cents")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(fast.toSeq === naive.toSeq)
  }

  test("saltedJoin equals the plain equi-join") {
    val fact = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"value")
    val dim = Tables.customer(spark, sf)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val plain = fact.join(dim, Seq("user_id"))
      .select($"event_id", $"c_mktsegment")
      .as[(Long, String)].collect().sortBy(identity)
    val salted = Skew.saltedJoin(fact, dim, "user_id", buckets = 8)
      .select($"event_id", $"c_mktsegment")
      .as[(Long, String)].collect().sortBy(identity)
    assert(salted.toSeq === plain.toSeq)
  }
}
