package graft

import org.apache.spark.sql.functions._

import graft.sources.{Ticker, TickerQueries}

/** DataSource V2 Ticker feed: schema, determinism, column pruning,
  * filter pushdown (partition pruning at planning time), and the
  * closed-form content contract the DuckDB oracle mirrors. */
class TickerSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ticker = spark.read.format("graft.sources.Ticker").load()

  test("full scan: |coins| x |exchanges| x |ticks| rows, default config") {
    assert(ticker.count() === 20L * 9 * 500)
  }

  test("deterministic: two scans agree row-for-row") {
    val a = ticker.orderBy("coin_id", "exchange", "tick").collect()
    val b = ticker.orderBy("coin_id", "exchange", "tick").collect()
    assert(a.sameElements(b))
  }

  test("content matches the closed-form md5 contract") {
    val row = ticker
      .filter($"coin_id" === "coin03" && $"exchange" === "ex2" && $"tick" === 7L)
      .select("price_cents", "volume_milli").as[(Long, Long)].head()
    val h = Ticker.hash12("coin03", "ex2", 7L)
    assert(row === ((Ticker.priceCents(h), Ticker.volumeMilli(h))))
    assert(h >= 0 && h < (1L << 48))
  }

  test("equality pushdown prunes partitions at planning time") {
    val pruned = ticker.filter($"exchange" === "ex0" && $"coin_id" === "coin01")
    assert(pruned.rdd.getNumPartitions === 1) // 1 of 180 pairs planned
    assert(pruned.count() === 500)
    val p = pruned.queryExecution.executedPlan.toString()
    assert(p.contains("TickerScan"), p)
  }

  test("IN-list pushdown keeps only the named pairs") {
    val pruned = ticker.filter($"coin_id".isin("coin00", "coin05"))
    assert(pruned.rdd.getNumPartitions === 2 * 9)
    assert(pruned.count() === 2L * 9 * 500)
  }

  test("tick range pushdown narrows generation, bounds half-open") {
    val slice = ticker.filter($"tick" >= 100L && $"tick" < 400L)
    assert(slice.count() === 20L * 9 * 300)
    val edge = ticker.filter($"tick" > 498L)
    assert(edge.count() === 20L * 9 * 1)
  }

  test("contradictory range plans zero partitions") {
    val none = ticker.filter($"tick" >= 400L && $"tick" < 100L)
    assert(none.rdd.getNumPartitions === 0)
    assert(none.count() === 0)
  }

  test("column pruning: tick-only projection reads LongType only") {
    val df = ticker.filter($"exchange" === "ex0").select("tick")
    assert(df.schema.fieldNames.toSeq === Seq("tick"))
    assert(df.distinct().count() === 500)
  }

  test("residual (non-pushable) predicates still apply Spark-side") {
    val df = ticker.filter($"exchange" === "ex0" && $"price_cents" % 2 === 0)
    val n = df.count()
    assert(n > 0 && n < 20L * 500)
  }

  test("ts derives from the 5-minute cadence") {
    val (t0, t1) = ticker.filter($"coin_id" === "coin00" && $"exchange" === "ex0")
      .filter($"tick".isin(0L, 1L))
      .orderBy("tick").select(unix_micros($"ts")).as[Long].collect() match {
        case Array(a, b) => (a, b)
      }
    assert(t1 - t0 === 300L * 1000000)
    assert(t0 === 1704067200L * 1000000) // 2024-01-01T00:00:00Z
  }

  test("limit pushdown caps generation per partition, result honored") {
    val df = ticker.filter($"exchange" === "ex0").limit(7)
    assert(df.count() === 7)
    val scanDesc = df.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("PushedLimit: 7"), scanDesc)
    // each of the 20 surviving partitions generates at most 7 ticks
    val generated = ticker.filter($"exchange" === "ex0").limit(7)
      .queryExecution.executedPlan.collectLeaves()
    assert(generated.nonEmpty)
  }

  test("top-N pushdown (tick desc): only the last N ticks generate") {
    val df = ticker
      .filter($"coin_id" === "coin00" && $"exchange" === "ex0")
      .orderBy($"tick".desc).limit(5)
    val got = df.select("tick").as[Long].collect().toSeq
    assert(got === Seq(499L, 498L, 497L, 496L, 495L))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedLimit: 5 (last ticks)"), p)
  }

  test("top-N pushdown (ts asc): ts ordering rides the tick ordering") {
    val df = ticker
      .filter($"coin_id" === "coin01" && $"exchange" === "ex1")
      .orderBy($"ts").limit(3)
    assert(df.select("tick").as[Long].collect().toSeq === Seq(0L, 1L, 2L))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedLimit: 3"), p)
  }

  test("top-N on a non-monotonic column is refused, result still exact") {
    val df = ticker
      .filter($"coin_id" === "coin00" && $"exchange" === "ex0")
      .orderBy($"price_cents".desc).limit(3)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("PushedLimit"), p)
    // equals brute force over the full range
    val brute = (0L until 500L).map(t => Ticker.priceCents(
      Ticker.hash12("coin00", "ex0", t))).sorted.reverse.take(3)
    assert(df.select("price_cents").as[Long].collect().toSeq === brute)
  }

  test("aggregate pushdown: per-pair census generates one closed-form row per partition") {
    val df = ticker
      .filter($"exchange" === "ex0" && $"tick" < 100L)
      .groupBy($"coin_id")
      .agg(count(lit(1)).as("n"), min($"tick").as("lo"), max($"tick").as("hi"),
        max($"ts").as("latest"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedAggregation"), p)
    val got = df.orderBy("coin_id")
      .select($"coin_id", $"n", $"lo", $"hi", unix_micros($"latest"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val expect = (0 until 20).map { c =>
      (f"coin$c%02d", 100L, 0L, 99L, (1704067200L + 99L * 300) * 1000000L)
    }
    assert(got === expect)
  }

  test("aggregate pushdown: global count(*) merges per-partition partials") {
    val df = ticker.filter($"tick" >= 10L && $"tick" < 20L)
      .agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedAggregation"), p)
    assert(df.as[Long].head() === 20L * 9 * 10)
  }

  test("aggregate on a hash-derived column is refused, result still exact") {
    val df = ticker.filter($"exchange" === "ex0" && $"coin_id" === "coin00")
      .agg(sum($"price_cents").as("s"))
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("PushedAggregation"), p)
    val brute = (0L until 500L)
      .map(t => Ticker.priceCents(Ticker.hash12("coin00", "ex0", t))).sum
    assert(df.as[Long].head() === brute)
  }

  test("runtime filtering: a selective dim join prunes pair partitions at execution time") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // AQE wraps stages in leaf QueryStageExec nodes, hiding the scan from
    // plan traversal — turn it off for this one observability check (the
    // pruning itself is AQE-independent)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the filter makes the build side SELECTIVE — the partition-pruning
      // rule only injects runtime filters when the dim carries a predicate.
      // (A filtered LocalRelation constant-folds the Filter away and DPP
      // sees no selectivity — build from Range so the Filter survives.)
      val dim = spark.range(0, 20)
        .select(format_string("coin%02d", $"id").as("coin_id"), $"id".as("w"))
        .filter($"w".isin(3L, 7L))
      val joined = ticker.join(dim, "coin_id")
        .agg(count(lit(1)).as("n"), sum($"w").as("sw"))
      val got = joined.collect() // executes THIS plan (derived Datasets re-plan)
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((2L * 9 * 500, 9L * 500 * (3 + 7)))) // both coins, all pairs
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("RuntimeFilters: [dynamicpruning"), plan)
      // the feed scan must have generated rows for ONLY the two surviving
      // coins — runtime pruning, not post-scan filtering
      val scans = joined.queryExecution.executedPlan
        .collectWithSubqueries { case b: BatchScanExec
          if b.scan.isInstanceOf[graft.sources.TickerScan] => b }
      assert(scans.nonEmpty)
      val generated = scans.map(_.metrics("numOutputRows").value).sum
      assert(generated === 2L * 9 * 500, s"scan generated $generated rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("gated census query runs on the pushed-aggregation path") {
    val df = TickerQueries.aggCensus(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedAggregation"), p)
    assert(df.count() === 40)
  }

  test("summary query equals a brute-force recomputation") {
    val got = TickerQueries.summary(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 20)
    val brute = (0 until 20).map { c =>
      val coin = f"coin$c%02d"
      val hs = (100L until 400L).map(Ticker.hash12(coin, "ex0", _))
      (coin, hs.length.toLong,
        hs.map(Ticker.priceCents).sum, hs.map(Ticker.priceCents).min,
        hs.map(Ticker.priceCents).max, hs.map(Ticker.volumeMilli).sum)
    }
    assert(got.toSeq === brute)
  }
}
