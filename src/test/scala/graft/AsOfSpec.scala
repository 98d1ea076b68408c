package graft

import java.sql.Timestamp

import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(s * 1000L)

  test("as-of join picks the latest right row at-or-before, per key") {
    val left = Seq(
      ("u1", ts(10), 1L), ("u1", ts(20), 2L), ("u1", ts(5), 3L),
      ("u2", ts(10), 4L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      ("u1", ts(8), 1.5), ("u1", ts(10), 2.5), ("u1", ts(15), 3.5),
      ("u3", ts(1), 9.9))
      .toDF("user_id", "ts", "p")
    val out = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("p"))
      .select("user_id", "event_id", "p")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(out(1L).contains(2.5)) // ts=10: right row AT 10 wins (inclusive)
    assert(out(2L).contains(3.5)) // ts=20: latest before is 15
    assert(out(3L).isEmpty)       // ts=5: nothing at-or-before
    assert(out(4L).isEmpty)       // u2: no right rows at all
  }

  test("a genuinely-null payload on the matched right row survives (not skipped back to a stale row)") {
    val left = Seq(("u1", ts(10), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq(("u1", ts(5), Some(1.5)), ("u1", ts(8), Option.empty[Double]))
      .toDF("user_id", "ts", "p")
    val out = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("p"))
      .select("p").as[Option[Double]].head()
    assert(out.isEmpty) // matched row is ts=8 whose p IS null
  }

  test("tolerance: stale matches are nulled, fresh ones carry their age") {
    val left = Seq(("u1", ts(100), 1L), ("u1", ts(500), 2L), ("u2", ts(50), 3L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(("u1", ts(90), 7.0), ("u2", ts(49), 8.0))
      .toDF("user_id", "ts", "p")
    val out = AsOf.joinAsOfTolerance(left, right, Seq("user_id"), "ts", "ts",
        Seq("p"), tolUs = 60L * 1000000L) // 60s freshness bound
      .select($"event_id", $"p", $"match_age_us")
      .as[(Long, Option[Double], Option[Long])].collect()
      .sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, Some(7.0), Some(10L * 1000000L)),  // 10s old: kept
      (2L, None, None),                        // 410s old: rejected
      (3L, Some(8.0), Some(1L * 1000000L))))
  }

  test("forward as-of picks the earliest right row at-or-after, per key") {
    val left = Seq(
      ("u1", ts(10), 1L), ("u1", ts(20), 2L), ("u1", ts(16), 3L),
      ("u2", ts(10), 4L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      ("u1", ts(10), 2.5), ("u1", ts(15), 3.5), ("u1", ts(8), 1.5),
      ("u3", ts(99), 9.9))
      .toDF("user_id", "ts", "p")
    val out = AsOf.joinAsOfForward(left, right, Seq("user_id"), "ts", "ts", Seq("p"))
      .select("user_id", "event_id", "p")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(out(1L).contains(2.5)) // ts=10: right row AT 10 wins (inclusive)
    assert(out(2L).isEmpty)       // ts=20: nothing at-or-after
    assert(out(3L).isEmpty)       // ts=16: 15 is before, nothing follows
    assert(out(4L).isEmpty)       // u2: no right rows at all
    // count preservation on real data
    val fwd = graft.queries.Analytics.asofForward(spark, sf)
    val clicks = graft.util.Tables.events(spark, sf)
      .filter("event_type = 'click'").count()
    assert(fwd.count() === clicks)
  }

  test("left row count is preserved (no cross product, no drops)") {
    val out = graft.queries.Analytics.asofJoin(spark, sf)
    val clicks = graft.util.Tables.events(spark, sf)
      .filter("event_type = 'click'").count()
    assert(out.count() === clicks)
  }

  test("manufactured (key, ts) tie resolves by the tie-break column, both directions") {
    val left = Seq(("u1", ts(10), 1L)).toDF("user_id", "ts", "event_id")
    // two right rows at the SAME (user_id, ts) with DIFFERENT payloads:
    // without a tie-break the winner would depend on payload ordering;
    // with rid as tieBreak, backward takes max(rid), forward min(rid)
    val right = Seq(
      ("u1", ts(10), 100L, 5.0), ("u1", ts(10), 200L, 2.0),
      ("u1", ts(10), 150L, 9.0))
      .toDF("user_id", "ts", "rid", "p")
    val back = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts",
        Seq("p"), tieBreak = Seq("rid"))
      .select("p").as[Option[Double]].head()
    assert(back.contains(2.0)) // rid=200 wins backward, NOT max payload 9.0
    val fwd = AsOf.joinAsOfForward(left, right, Seq("user_id"), "ts", "ts",
        Seq("p"), tieBreak = Seq("rid"))
      .select("p").as[Option[Double]].head()
    assert(fwd.contains(5.0)) // rid=100 wins forward, NOT min payload 2.0
    val tol = AsOf.joinAsOfTolerance(left, right, Seq("user_id"), "ts", "ts",
        Seq("p"), tolUs = 1000000L, tieBreak = Seq("rid"))
      .select("p").as[Option[Double]].head()
    assert(tol.contains(2.0)) // same backward pick, age 0 within tolerance
  }

  test("oracle tie precondition: right side unique per (user_id, ts)") {
    // DuckDB's ASOF JOIN picks an unspecified row at exact-ts ties, so
    // the q_asof_* hash gates assume no (user_id, ts) collisions among
    // purchase events — see AsOf's scaladoc tie contract
    val dups = graft.util.Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .groupBy("user_id", "ts").count()
      .filter("count > 1").count()
    assert(dups === 0L, s"$dups (user_id, ts) collisions break the asof oracles")
  }
}
