package graft

import org.apache.spark.sql.functions._

import graft.queries.Temporal
import graft.util.Tables

/** Temporal/sequence operators (round 4): interval merge, drawdown,
  * Markov transitions, weighted median, rolling OLS slope, cumulative
  * distinct users. Each cross-checked against an independent brute-force
  * computation on the sf0.001 tables. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def events =
    Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()

  test("intervalMerge: islands cover every event; island bounds nest") {
    val width = 30L * 60 * 1000000
    val byUser = events.groupBy(_._1)
    val brute = byUser.map { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var islands = 0
      var maxEnd = Long.MinValue
      var n = Map.empty[Int, Long]
      sorted.foreach { e =>
        if (e._2 > maxEnd) islands += 1
        maxEnd = math.max(maxEnd, e._2 + width)
        n = n.updated(islands, n.getOrElse(islands, 0L) + 1)
      }
      u -> n
    }
    val got = Temporal.intervalMerge(spark, sf)
      .select($"user_id", $"island", $"n_events")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(r => r._2.toInt -> r._3).toMap
      }
    assert(got === brute)
  }

  test("intervalMerge: within a user, islands are disjoint and ordered") {
    val rows = Temporal.intervalMerge(spark, sf)
      .select($"user_id", $"island",
        unix_micros($"island_start"), unix_micros($"island_end"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    rows.values.foreach { isl =>
      val sorted = isl.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3) // prev end < next start
        case _ =>
      }
    }
  }

  test("drawdown: matches the scalar running-peak recurrence") {
    val brute = events.groupBy(_._1).map { case (u, evs) =>
      val cents = evs.sortBy(e => (e._2, e._3))
        .map(e => math.round(e._4 * 100))
      var cum = 0L; var peak = Long.MinValue; var dd = Long.MinValue
      cents.foreach { c =>
        cum += c; peak = math.max(peak, cum); dd = math.max(dd, peak - cum)
      }
      u -> ((dd, peak, cents.length.toLong))
    }
    val got = Temporal.drawdown(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, dd, pk, n) => u -> ((dd, pk, n)) }.toMap
    assert(got === brute)
  }

  test("transitions: per-source probabilities sum to 1; counts match") {
    val rows = Temporal.transitionMatrix(spark, sf)
      .as[(String, String, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { grp =>
      assert(math.abs(grp.map(_._4).sum - 1.0) < 1e-9)
    }
    // total transition count = total events - one per (user) sequence
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_._3).sum === nEvents - nUsers)
  }

  test("weightedMedian: cumulative-weight definition holds") {
    val byType = Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id")
      .as[(String, Double, Long)].collect()
      .groupBy(_._1)
    val brute = byType.map { case (t, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
        .map(e => (math.round(e._2 * 100), e._3 % 7 + 1))
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      t -> ((med, tot))
    }
    val got = Temporal.weightedMedian(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (t, m, w) => t -> ((m, w)) }.toMap
    assert(got === brute)
  }

  test("rollingSlope: matches least-squares fit on a sampled frame") {
    val rows = Temporal.rollingSlope(spark, sf)
      .filter($"slope_cents".isNotNull)
      .as[(Long, String, java.sql.Timestamp, Long, Double)].collect()
    assert(rows.nonEmpty)
    // recompute one series' slopes by brute force
    val (u, t) = (rows.head._1, rows.head._2)
    val series = Tables.events(spark, sf)
      .filter($"user_id" === u && $"event_type" === t)
      .select(unix_micros($"ts"), $"event_id", $"value")
      .as[(Long, Long, Double)].collect()
      .sortBy(e => (e._1, e._2))
      .map(e => math.round(e._3 * 100).toDouble)
    val expected = series.indices.collect {
      case i if i >= 19 =>
        val ys = series.slice(i - 19, i + 1)
        val xs = (i - 18).to(i + 1).map(_.toDouble) // row_number is 1-based
        val n = 20.0
        val (sx, sy) = (xs.sum, ys.sum)
        val sxx = xs.map(x => x * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val got = rows.filter(r => r._1 == u && r._2 == t)
      .sortBy(r => (r._3.getTime, r._4)).map(_._5)
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
  }

  test("cumulativeDistinctUsers: final cumulative equals distinct users") {
    val rows = Temporal.cumulativeDistinctUsers(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.last._3 === nUsers)
    assert(rows.map(_._2).sum === nUsers)
    // cumulative is the prefix sum of new_users
    assert(rows.scanLeft(0L)(_ + _._2).tail.toSeq === rows.map(_._3).toSeq)
  }

  test("twap: matches the scalar interval-weighted mean per user") {
    val got = Temporal.twap(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val ticks = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    ticks.foreach { case (u, rows) =>
      val s = rows.sortBy(r => (r._2, r._3))
      val iv = s.zip(s.tail).map { case (a, b) => (a._4, b._2 - a._2) }
        .filter(_._2 > 0)
      if (iv.nonEmpty) {
        val (n, span) = (iv.length.toLong, iv.map(_._2).sum)
        val exp = iv.map { case (c, d) => c.toDouble * d }.sum / span / 100.0
        val g = got(u)
        assert(g._2 === n && g._3 === span, s"user $u intervals/span")
        assert(math.abs(g._4 - exp) < 1e-6, s"user $u twap")
      } else assert(!got.contains(u))
    }
  }

  test("seasonality: cells partition the event count") {
    val cells = Temporal.seasonality(spark, sf)
      .as[(Int, Int, Long, Long, Long)].collect()
    assert(cells.map(_._3).sum === Tables.events(spark, sf).count())
    cells.foreach { c =>
      assert(c._1 >= 1 && c._1 <= 7 && c._2 >= 0 && c._2 <= 23)
    }
  }

  test("realizedVol: vol = sqrt(rv), park >= 0, counts bounded by ticks") {
    val rows = Temporal.realizedVol(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rv = Option(r.getAs[java.lang.Long]("rv_q6")).map(_.toDouble / 1e6)
      val vol = Option(r.getAs[java.lang.Long]("vol_q6")).map(_.toDouble / 1e6)
      (rv, vol) match {
        case (Some(a), Some(v)) =>
          assert(a >= 0 && math.abs(v - math.sqrt(a)) < 1e-4)
        case (None, None) => // first-tick-only day: no returns
        case other => fail(s"rv/vol null mismatch: $other")
      }
      assert(r.getAs[Long]("park_q6") >= 0L)
    }
    val ticks = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_returns")).sum < ticks)
  }

  test("marketBeta: beta of the summed market against itself is ~1") {
    val rows = Temporal.marketBeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Option(r.getAs[java.lang.Double]("corr")).foreach(c =>
        assert(c >= -1.0000001 && c <= 1.0000001))
    }
    // the market is the sum of members: average beta over users is near
    // 1/|users| x |users| = 1 in aggregate terms; assert betas are finite
    assert(rows.flatMap(r => Option(r.getAs[java.lang.Double]("beta")))
      .forall(b => !b.isNaN && !b.isInfinite))
  }

  test("leadLag: lag 0 equals marketBeta's corr, all lags in [-1,1]") {
    val ll = Temporal.leadLag(spark, sf).collect()
    assert(ll.map(_.getAs[Long]("lag")).distinct.sorted.sameElements(Seq(-2L, -1L, 0L, 1L, 2L)))
    ll.foreach { r =>
      Option(r.getAs[java.lang.Double]("xcorr")).foreach(c =>
        assert(c >= -1.0000001 && c <= 1.0000001))
    }
    val beta = Temporal.marketBeta(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    ll.filter(_.getAs[Long]("lag") == 0L).foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(Option(r.getAs[java.lang.Double]("xcorr")) == beta(u),
        s"lag-0 corr disagrees with marketBeta for user $u")
    }
  }

  test("tickRule: signs carry through zero-ticks; OFI matches brute force") {
    // Brute-force the Lee-Ready zero-tick convention per user
    val brute = events.groupBy(_._1).map { case (u, evs) =>
      val p = evs.sortBy(e => (e._2, e._3)).map(e => math.round(e._4 * 100))
      var sign = 0L
      var b, s = 0L
      p.zipWithIndex.foreach { case (pc, i) =>
        if (i > 0) {
          val d = pc - p(i - 1)
          if (d > 0) sign = 1 else if (d < 0) sign = -1
        }
        if (sign == 1) b += pc else if (sign == -1) s += pc
      }
      u -> (b, s)
    }
    val got = Temporal.tickRule(spark, sf)
      .groupBy($"user_id")
      .agg(sum($"buy_cents").as("b"), sum($"sell_cents").as("s"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    brute.foreach { case (u, (b, s)) =>
      assert(got.get(u).contains((b, s)), s"tick totals diverge for user $u")
    }
  }

  test("rollSpread: spread only on negative serial covariance, else null") {
    Temporal.rollSpread(spark, sf).collect().foreach { r =>
      val cov = r.getAs[Long]("serial_cov_q6") / 1e6
      val spr = Option(r.getAs[java.lang.Long]("roll_spread_q6"))
        .map(_.toDouble / 1e6)
      if (cov < 0) {
        assert(spr.isDefined && spr.get >= 0)
        // spread in dollars recovers 2*sqrt(-cov)/100 (cov is in cents^2)
        assert(math.abs(spr.get - 2 * math.sqrt(-cov) / 100) < 1e-5)
      } else assert(spr.isEmpty, s"spread emitted on cov=$cov")
    }
  }

  test("kmConversion: risk sets telescope; survival monotone; censor mass at cut") {
    val rows = Temporal.kmConversion(spark, sf).collect()
    assert(rows.length > 1)
    // n_at_risk at row i+1 = n_at_risk at i minus everyone removed at i
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_at_risk") ==
        a.getAs[Long]("n_at_risk") - a.getAs[Long]("d") - a.getAs[Long]("c_censored"))
      assert(b.getAs[Long]("survival_q6") <= a.getAs[Long]("survival_q6") + 1L,
        "survival must be non-increasing")
    }
    // censoring only at the administrative 48h cut
    rows.dropRight(1).foreach(r => assert(r.getAs[Long]("c_censored") == 0L))
    // uncensored prefix: KM == empirical survival (product telescopes)
    val n0 = rows.head.getAs[Long]("n_at_risk")
    rows.dropRight(1).foreach { r =>
      val expect = (r.getAs[Long]("n_at_risk") - r.getAs[Long]("d")).toDouble / n0
      assert(math.abs(r.getAs[Long]("survival_q6") / 1e6 - expect) < 1e-4,
        s"uncensored KM should equal empirical survival at dur=${r.getAs[Long]("dur")}")
    }
  }

  test("hurst: rs8 matches a brute-force R/S; block counts nest") {
    val brute = events.groupBy(_._1).flatMap { case (u, evs) =>
      val v = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val r = v.sliding(2).map(p =>
        math.round((math.log(p(1)) - math.log(p(0))) * 1e6)).toArray
      val s = 8
      val lns = r.grouped(s).filter(_.length == s).flatMap { blk =>
        val tot = blk.sum
        val sy = blk.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (cum, i) => s * cum - (i + 1) * tot }
        val varU = s * blk.map(x => x * x).sum - tot * tot
        if (varU > 0)
          Some(math.round(math.log(
            (sy.max - sy.min).toDouble / math.sqrt(varU.toDouble)) * 1e6))
        else None
      }.toArray
      if (lns.isEmpty) None
      else Some(u -> math.round(lns.sum.toDouble / lns.length) / 1e6)
    }
    val got = Temporal.hurst(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("rs8"), r.getAs[Long]("n8"),
         r.getAs[Long]("n16"), r.getAs[Long]("n32"))).toMap
    assert(got.nonEmpty)
    got.foreach { case (u, (rs8, n8, n16, n32)) =>
      assert(n8 >= n16 && n16 >= n32 && n32 >= 1)
      assert(math.abs(rs8 - brute(u)) < 1e-9,
        s"rs8 diverges from brute force for user $u: $rs8 vs ${brute(u)}")
    }
  }

  test("attribution: both models conserve attributable purchase revenue") {
    val got = Temporal.attribution(spark, sf).collect()
    assert(got.map(_.getAs[String]("channel")).sorted
      .sameElements(Array("click", "signup", "view")))
    val linTotal = got.map(_.getAs[Double]("linear_rev")).sum
    val decTotal = got.map(_.getAs[Double]("decay_rev")).sum
    // independent total: purchases having >= 1 touch in the 7d lookback
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(Long, String, Long, Long)].collect()
    val day = 86400L * 1000000
    val expect = ev.filter(_._2 == "purchase").filter { p =>
      ev.exists(t => t._1 == p._1
        && Set("click", "view", "signup")(t._2)
        && t._3 < p._3 && t._3 >= p._3 - 7 * day)
    }.map(_._4).sum / 100.0
    // rounding error bounded by 1e-8 dollars per credited pair
    assert(math.abs(linTotal - expect) < 1.0, s"linear $linTotal vs $expect")
    assert(math.abs(decTotal - expect) < 1.0, s"decay $decTotal vs $expect")
  }

  test("amihud is non-negative; kyleLambda finite on every series") {
    val amihud = Temporal.amihud(spark, sf).collect()
    amihud.foreach { r =>
      assert(r.getAs[Double]("amihud") >= 0, "illiquidity must be >= 0")
    }
    val kl = Temporal.kyleLambda(spark, sf).collect()
    assert(kl.length > 0)
    kl.foreach { r =>
      Option(r.getAs[java.lang.Double]("kyle_lambda")).foreach(v =>
        assert(!v.isNaN && !v.isInfinite))
    }
  }

  test("varEs: matches a sort-based order-statistic recompute per type") {
    val out = Temporal.varEs(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    val raw = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100).cast("long").as("c"))
      .as[(String, Long)].collect()
    val byType = raw.groupBy(_._1)
    assert(out.map(_._1).toSet === byType.keySet)
    out.foreach { case (et, n, k, v95, es95) =>
      val sorted = byType(et).map(_._2).sorted
      assert(n === sorted.length)
      assert(k === (sorted.length + 19) / 20)
      assert(v95 === sorted(k.toInt - 1).toDouble / 100.0)
      val tail = sorted.take(k.toInt)
      val expect = math.round(
        tail.sum.toDouble / k / 100.0 * 1e6).toDouble / 1e6
      assert(es95 === expect, s"$et: $es95 vs $expect")
      assert(es95 <= v95 + 1e-12, "tail mean cannot exceed the quantile")
    }
  }

  test("winsorize: clip points and mean match a sort-based recompute") {
    val out = Temporal.winsorize(spark, sf)
      .as[(String, Long, Double, Double, Long, Long, Double)].collect()
    val raw = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out.map(_._1).toSet === raw.keySet)
    out.foreach { case (et, n, p05, p95, clo, chi, wmean) =>
      val sorted = raw(et).map(_._2).sorted
      assert(n === sorted.length)
      val k05 = (sorted.length + 19) / 20
      val k95 = (19 * sorted.length + 19) / 20
      val (v05, v95) = (sorted(k05 - 1), sorted(k95 - 1))
      assert(p05 === v05.toDouble / 100.0 && p95 === v95.toDouble / 100.0)
      assert(clo === sorted.count(_ < v05))
      assert(chi === sorted.count(_ > v95))
      val wsum = sorted.map(v => math.max(v05, math.min(v95, v))).sum
      val expect = math.round(
        wsum.toDouble / n / 100.0 * 1e6).toDouble / 1e6
      assert(wmean === expect, s"$et: $wmean vs $expect")
    }
  }

  test("abCuped: matches a from-scratch recompute; CUPED preserves the pooled mean") {
    val out = Temporal.abCuped(spark, sf)
      .as[(Int, Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(0, 1))
    // recompute from raw purchase rows
    val raw = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("tus"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    val mid = (raw.map(_._2).min + raw.map(_._2).max) / 2
    val per = raw.groupBy(_._1).map { case (u, g) =>
      (u % 2, g.filter(_._2 <= mid).map(_._3).sum.toDouble,
        g.filter(_._2 > mid).map(_._3).sum.toDouble)
    }.toSeq
    val n = per.size.toDouble
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    val sxx = per.map(r => r._2 * r._2).sum
    val sxy = per.map(r => r._2 * r._3).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def close(a: Double, b: Double, tol: Double = 2e-6) =
      assert(math.abs(a - b) <= tol, s"$a vs $b")
    out.foreach { case (v, nv, th, my, mc, vy, vc, vr) =>
      val g = per.filter(_._1 == v)
      assert(nv === g.size)
      close(th, theta)
      val (mx, myRaw) = (g.map(_._2).sum / g.size, g.map(_._3).sum / g.size)
      close(my, myRaw / 100.0)
      close(mc, (myRaw - theta * (mx - sx / n)) / 100.0)
      val adj = g.map(r => r._3 - theta * (r._2 - mx)) // per-row twin
      val varAdj = adj.map(a => math.pow(a - adj.sum / adj.size, 2)).sum /
        (adj.size - 1)
      close(vc, varAdj / 10000.0, 1e-3) // float-accumulation slack only
      assert(vc <= vy + 1e-9, "CUPED must not inflate variance here")
      close(vr, 1.0 - vc / vy, 1e-5)
    }
    // the adjustment is mean-zero pooled: weighted means agree
    val pooledRaw = out.map(r => r._2 * r._4).sum / out.map(_._2).sum
    val pooledAdj = out.map(r => r._2 * r._5).sum / out.map(_._2).sum
    close(pooledAdj, pooledRaw, 1e-5)
  }
}
