package graft

import graft.queries.Analytics

/** Physical-plan guards for the properties that matter at 100 TB: filters
  * reaching the parquet scan, dimensions broadcast instead of shuffled,
  * map-side partial aggregation, and whole-stage codegen on the hot path.
  * These assert on `executedPlan`, so a regression in any query's shape
  * fails the build — not just a slow bench. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q1_agg: shipdate filter is pushed to the scan; aggregation is partial+final") {
    val df = Analytics.q1Agg(spark, sf)
    df.collect() // materialize THIS plan so AQE finalizes it (codegen visible)
    val p = plan(df)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("HashAggregate".r.findAllIn(fmt).size >= 2, fmt) // partial + final
    // '*' marks whole-stage-codegen'd operators in formatted explain
    assert(fmt.contains("* HashAggregate") && fmt.contains("* Filter"), fmt)
  }

  test("q3_top_orders: selective dim is broadcast, facts shuffle only on the join key") {
    val p = plan(Analytics.q3TopOrders(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("q_coin_table: all three dimension joins are broadcast") {
    val p = plan(Analytics.coinTable(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_price_chart: time range AND suffix predicate reach the parquet reader") {
    val p = plan(Analytics.priceChart(spark, sf))
    assert(p.contains("EndsWith(event_type"), p)
    // on the RAW stored column (int64 or ntz, per encoding) — never on
    // the cast; SchemaDriftSpec asserts this for every physical encoding
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
    assert(p.contains("LessThan(ts,"), p)
    // only the projected columns are read
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("props"), p)
  }

  test("q_doc_features: pure projection pass — no shuffle at all") {
    val p = plan(graft.ops.TextAnalysis.docFeatures(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_asof_join: union+window composition, never a cross product") {
    val p = plan(Analytics.asofJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("q_range_join: banded equi-join, never a nested-loop theta join") {
    val p = plan(Analytics.rangeJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q5: dims broadcast, facts shuffle, no cross products") {
    val df = Analytics.q5LocalSupplier(spark, sf)
    df.collect()
    val p = plan(df)
    // supplier and the region-filtered nation dim ride as broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the order-date range reaches the orders scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Spark injects a bloom filter built from the selective dim side into
    // the fact scan (runtime row-level pruning BEFORE the shuffle) — at
    // 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~matching slice. Thresholds lowered to
    // demo scale; result must stay exact.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep a shuffle join
      val li = graft.util.Tables.lineitem(spark, sf)
      val sel = graft.util.Tables.part(spark, sf)
        .filter(org.apache.spark.sql.functions.col("p_partkey") % 100 === 0)
        .select("p_partkey")
      val joined = li.join(sel,
        li("l_partkey") === sel("p_partkey"))
      val n = joined.collect().length
      val expectKeys = sel.collect().map(_.getLong(0)).toSet
      val expect = li.select("l_partkey").collect()
        .count(r => expectKeys.contains(r.getLong(0)))
      assert(n === expect)
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"no runtime bloom filter in:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q_chunk_overlap: zero-shuffle projection pass") {
    val p = plan(graft.ops.TextAnalysis.chunkOverlap(spark, sf).limit(10))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_feature_scale / q_vwap / q_label_encode: stats and dims ride broadcasts") {
    Seq(Analytics.featureScale(spark, sf),
        Analytics.vwap(spark, sf),
        Analytics.labelEncode(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }

  test("q_triangles: order-date window reaches the orders scan; joins never nest loops") {
    // edge derivation (pre-checkpoint): the date window must prune the scan
    val pe = plan(graft.ops.Graph.copurchaseEdges(spark, sf))
    assert(pe.contains("GreaterThanOrEqual(o_orderdate"), pe)
    // full query (post-checkpoint): wedge + closing joins stay hash/merge
    val p = plan(graft.ops.Graph.copurchaseTriangles(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_semantic: pair probe shuffles both sides on the cluster key") {
    val p = plan(graft.ops.Dedup.semanticDedup(spark, sf))
    // the left-semi probe must be a shuffled hash join (build = one
    // cluster's bucket), not a corpus-wide broadcast and not a sort-merge
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("shingle self-joins shuffle on the key — never broadcast an explode") {
    // Catalyst sizes a Generate by its parquet child, so without the
    // shuffle_hash hints it would broadcast the whole exploded shingle /
    // band table: an unbounded build side once the corpus outgrows one
    // executor. Guard both candidate-generation shapes.
    Seq(graft.ops.Dedup.jaccardPairs(spark, sf),
        graft.ops.Dedup.lshCandidates(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("q_trade_volume: both nation maps broadcast; date range reaches the scan") {
    val p = plan(graft.queries.Relational.tradeVolume(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_drawdown: stacked windows + final agg reuse ONE user_id shuffle") {
    // cumsum window, running-max window and the per-user reduction all
    // hash-partition on user_id — Catalyst must plan a single Exchange,
    // or at 100 TB the path data crosses the network three times.
    val p = plan(graft.queries.Temporal.drawdown(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q_rolling_slope: five moment sums share one Window operator") {
    val p = plan(graft.queries.Temporal.rollingSlope(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    // row_number spec and the moment frames differ, but there is no
    // reason for more than the two Window operators
    assert("Window".r.findAllIn(p).size <= 2, p)
  }

  test("q_interval_merge: island detection is one shuffle + reused agg") {
    val p = plan(graft.queries.Temporal.intervalMerge(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q_fuzzy_pairs: blocked self-join never degenerates to a cross product") {
    val p = plan(graft.ops.Linkage.fuzzyPairsByBrand(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LevenshteinBandRule: threshold predicates rewrite to the banded form, results unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    import org.apache.spark.sql.functions.expr
    val df = Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
      (null, "x")).toDF("a", "b")
    // unit: the rule swaps in a thresholded Levenshtein
    val analyzed = df.filter(expr("levenshtein(a, b) <= 2")).queryExecution.analyzed
    val rewritten = graft.plans.LevenshteinBandRule(analyzed)
    var thresholded = 0
    rewritten.transformAllExpressions {
      case l: Levenshtein if l.threshold.isDefined => thresholded += 1; l
    }
    assert(thresholded === 1, rewritten.toString)
    // end-to-end: with the rule installed, every comparison shape keeps
    // its semantics (null rows stay dropped, boundary distances kept)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.LevenshteinBandRule
    try {
      def pairs(cond: String): Set[(String, String)] =
        df.filter(expr(cond)).as[(String, String)].collect().toSet
      assert(pairs("levenshtein(a, b) <= 2") === Set(("abc", "abd"), ("same", "same")))
      assert(pairs("levenshtein(a, b) <= 3") ===
        Set(("kitten", "sitting"), ("abc", "abd"), ("same", "same")))
      assert(pairs("levenshtein(a, b) < 1") === Set(("same", "same")))
      assert(pairs("1 >= levenshtein(a, b)") === Set(("abc", "abd"), ("same", "same")))
      assert(pairs("levenshtein(a, b) <= -1") === Set.empty) // degenerate: not rewritten
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.LevenshteinBandRule)
    }
  }

  test("q_ngram_novelty: novel counts derive from aggregates, not a stream re-join") {
    // the exploded shingle stream must be shuffled once on the gram key;
    // joining the raw stream back to firsts would double the wide exchange
    val p = plan(graft.ops.TextAnalysis.ngramNovelty(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q_dedup_embedding: pair probe shuffles on the block key, never broadcasts the corpus") {
    // the embedding table scales with the corpus — a BroadcastExchange of
    // it is the 100 TB executor-OOM; the join must be shuffled-hash on
    // `label` (ShuffledHashJoin builds one label's bucket per task)
    val p = plan(graft.ops.Dedup.embeddingNearDups(spark, sf))
    assert(!p.contains("BroadcastExchange"), p)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("q_dsir: the bucket model rides a broadcast; the corpus is never sort-merge joined") {
    // the model is 256 rows by construction — if it ever arrives at the
    // doc-scoring join via a shuffle instead of a broadcast, every corpus
    // row pays an exchange for a table that fits in a cache line. (The
    // final doc_id fold-back joins two corpus-sized sides and may
    // legitimately sort-merge.)
    val p = plan(graft.ops.TextAnalysis.dsirWeights(spark, sf))
    assert(p.contains("BroadcastHashJoin [bucket"), p)
  }

  test("q_ann_pq: codebooks and ADC table broadcast; corpus never builds a join hash side") {
    // PQ's whole point is that the corpus is touched only by scan +
    // map-side lookup: codebooks (m*ksub rows) and the query's ADC table
    // must broadcast, and no corpus-sized relation may be a build side
    val p = plan(graft.ops.Similarity.pqTopK(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_hybrid_rrf: both retrieval arms are per-partition top-k, not global sorts") {
    // each arm's top-50 must compile to TakeOrderedAndProject (partition-
    // local heaps, k rows to the driver) — a global Sort+Limit would
    // range-shuffle the full scored corpus twice before fusing 100 rows
    val p = plan(graft.ops.TextAnalysis.hybridTopK(spark, sf))
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
  }

  test("q_span_scrub: occurrence count + keeper election share ONE Window operator") {
    // both window expressions ride the same gm partition spec; splitting
    // them (e.g. chained withColumn) doubles the pass over every sorted
    // gm partition — at 100 TB that is a second full-corpus evaluation
    val df = graft.ops.TextAnalysis.spanScrub(spark, sf)
    df.collect()
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // count "Window (n)" TREE nodes in the final AQE plan only (the
    // Initial Plan section repeats the tree; details repeat the names)
    val finalPlan = fmt.split("== Initial Plan ==").head
    assert("Window \\(\\d+\\)".r.findAllIn(finalPlan).size === 1, fmt)
  }

  test("q_source_overlap: per-source totals REUSE the gram exchange") {
    // the pair census and the per-source totals both derive from the
    // gm-keyed collect_set aggregate; the totals side must plan as a
    // ReusedExchange, not a second corpus-scale shuffle
    val df = graft.ops.TextAnalysis.sourceOverlap(spark, sf)
    df.collect()
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("ReusedExchange"), fmt)
  }

  test("q_unimax / q_dedup_best: tiny tables broadcast onto the corpus") {
    // the allocation table is |languages| rows and the winner table is
    // dup-rate-bounded — neither may force the corpus into a sort-merge
    val pu = plan(graft.ops.TextAnalysis.unimaxSample(spark, sf))
    assert(pu.contains("BroadcastHashJoin"), pu)
    assert(!pu.contains("SortMergeJoin"), pu)
    val pb = plan(graft.ops.Graph.canonicalSurvivors(spark, sf))
    assert(pb.contains("BroadcastHashJoin"), pb)
  }

  test("q_array_funcs / q_readability: single projection pass, no shuffle") {
    // higher-order array exprs and the readability counts must evaluate
    // inline in the scan stage — a shuffle here means the plan fell off
    // the 100 TB path
    val pa = plan(graft.ops.Similarity.arrayFuncs(spark, sf))
    assert(!pa.contains("Exchange hashpartitioning"), pa)
    val pr = plan(graft.ops.TextAnalysis.readability(spark, sf))
    assert(!pr.contains("Exchange hashpartitioning"), pr)
  }

  test("q_pmi: vocab and N ride broadcasts; only doc-keyed shuffles remain") {
    val p = plan(graft.ops.TextAnalysis.pmiPairs(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row N cross join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_cdc_merge: both slice predicates reach the scans; merge is a key SMJ") {
    // Spark has no broadcast full-outer — the merge is a sort-merge on
    // the key (base side would be bucketed in storage at scale). What
    // must hold here: the base/change time slices prune their scans.
    val p = plan(graft.ops.Cdc.cdcMerge(spark, sf))
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
    assert(p.contains("LessThan(ts,"), p)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_skew_join: salted join stays a hash join over the replicated dim") {
    val p = plan(Analytics.skewJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_countmin: probe joins the broadcast sketch; exact top-k is a per-partition reduction") {
    val p = plan(graft.ops.TextAnalysis.countMin(spark, sf))
    // the 256-cell sketch must broadcast onto the probes, never shuffle them
    assert(p.contains("BroadcastHashJoin"), p)
    // exact top-20 = TakeOrderedAndProject (k-row reduction), not a
    // global rank window pulling every term to one task
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_semi_anti: existence checks compile to semi/anti joins, no post-join dedup") {
    val p = plan(graft.queries.Relational.existenceJoins(spark, sf))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_knn_graph: per-node top-k runs through the partial TopKPerKey operator") {
    // truncate=false keeps the lineage visible — the production path
    // checkpoints the same stages, which would hide them as ExistingRDD
    val p = plan(graft.ops.Similarity.knnGraph(spark, sf, truncate = false))
    // partial + final = two TopKPerKey nodes; the exchange between them
    // carries at most k rows per key per task
    assert(p.split("TopKPerKey").length - 1 >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_target_encode / q_var_es: census aggregates are partial+final; windows ride bounded frames") {
    val te = graft.ops.Prep.targetEncode(spark, sf)
    te.collect()
    val pte = plan(te)
    assert(!pte.contains("CartesianProduct"), pte)
    // the only corpus-scale work is the census aggregate; the window
    // math must sit ABOVE an aggregate, never over the orders scan
    val fmtTe = te.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("HashAggregate".r.findAllIn(fmtTe).size >= 2, fmtTe)
    val ve = graft.queries.Temporal.varEs(spark, sf)
    ve.collect()
    val pve = plan(ve)
    // the running-count window runs over the (type, cents) HISTOGRAM:
    // an aggregate must appear below the Window operator
    val winIdx = pve.indexOf("Window")
    val aggBelow = pve.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"window not over the histogram aggregate:\n$pve")
  }

  test("q_kmv_overlap: sketch build is TopKPerKey partial+final; estimates ride broadcasts") {
    // truncate=false keeps the sketch lineage visible (knnGraph pattern)
    val df = graft.ops.TextAnalysis.kmvOverlap(spark, sf, truncate = false)
    df.collect()
    val p = plan(df)
    assert(p.split("TopKPerKey").length - 1 >= 2, p)
    // per-source distinct counts broadcast back onto the pair census
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_js_divergence: one gram self-join on the term key, never a cross product") {
    val df = graft.ops.TextAnalysis.jsDivergence(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_unicode_norm / q_benford: single map-side-combinable aggregate over the scan") {
    Seq(graft.ops.TextAnalysis.unicodeNorm(spark, sf),
        graft.ops.DataQuality.benford(spark, sf)).foreach { df =>
      df.collect()
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert("HashAggregate".r.findAllIn(fmt).size >= 2, fmt)
    }
  }

  test("q_dq_checks: per-table checks fold into partial+final aggregates; joins stay keyed") {
    val df = graft.ops.DataQuality.dqChecks(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // every multi-sum table pass is a partial+final HashAggregate pair
    assert("HashAggregate".r.findAllIn(fmt).size >= 2, fmt)
  }
}
