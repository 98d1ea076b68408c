package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Record linkage: approximate-match joins for entity resolution — the
  * fuzzy cousin of [[Dedup]]'s set-similarity ops (there: token sets;
  * here: edit distance on short strings).
  *
  * The scale pattern is BLOCKING: never evaluate the O(n²) pairwise edit
  * distance across the corpus — first shuffle both sides on a cheap
  * blocking key that any true match must share, then run the quadratic
  * comparison only within each (small, bounded) block. This is the same
  * candidate-generation/verification split LSH uses, with a deterministic
  * key instead of a probabilistic one: recall is exact for matches that
  * agree on the blocking key, zero outside it — state the key's
  * assumptions, don't hide them.
  */
object Linkage {

  /** Within-block fuzzy pairs: part names compared by Levenshtein distance
    * inside p_brand blocks, rolled up per brand.
    *
    * The self-join shuffles both sides on the block key once (sort-merge
    * on equal keys); with B blocks of ~n/B rows the comparison count drops
    * from n²/2 to B·(n/B)²/2 — a 1/B reduction, and each block's work is
    * independent → embarrassingly parallel across executors. `levenshtein`
    * is a codegen'd Catalyst expression (no UDF). Output is the per-brand
    * rollup (pair counts explode quadratically inside dup-heavy blocks;
    * aggregate at the block level so the result stays bounded).
    *
    * Brand alone is a FIXED-cardinality key, so brand-block population
    * grows linearly with the corpus and pair volume quadratically — the
    * BENCH_sf1 run measured exactly that (38x time at 10x data). The
    * block key is therefore (brand, length band): edit distance >= the
    * length difference, so any pair within `maxDist` differs by at most
    * one band of width `maxDist + 1` — the probe side expands to bands
    * {b-1, b, b+1} (each qualifying pair meets in EXACTLY one band, the
    * build row's own, so nothing duplicates) and recall stays exact
    * while the quadratic term divides by the number of occupied bands.
    * The same ±1-band equi-join shape as Analytics.rangeJoin; bands stay
    * coarse enough that the harness's smallest fixture keeps its
    * matches — the failure mode to AVOID with composite keys is blocks
    * so fine every match becomes a singleton (zero recall).
    *
    * Reference ties: the reference's only string matching is exact
    * suffix/equality (`flask/app.py:51,110,163`); this is the upgrade
    * entity resolution needs at scale. */
  def fuzzyPairsByBrand(spark: SparkSession, dir: String,
      maxDist: Int = 4): DataFrame = {
    val w = maxDist + 1 // band width: |len diff| <= maxDist spans <= 1 boundary
    // collapse to DISTINCT (brand, name) groups FIRST — dedupe-then-link:
    // duplicate strings (rife in real catalogs) pay the DP once, and the
    // row-pair statistics come back combinatorially (ca·cb cross pairs
    // per distinct-name pair, C(c,2) zero-distance pairs inside a group).
    // The quadratic term then grows with the DISTINCT-name population,
    // not the row count. Materialized once; three consumers.
    val g = Tables.part(spark, dir)
      .groupBy(col("p_brand"), col("p_name")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // the probe side carries the quadratic DP work; spread it across the
    // cluster (free at scale, where the scan is already many splits)
    val a = g.repartition(spark.sparkContext.defaultParallelism)
      .select(col("p_brand"), col("p_name").as("a_name"), col("c").as("ca"))
      .withColumn("band",
        explode(array(Seq(-1, 0, 1).map(d => expr(s"length(a_name) div $w") + d): _*)))
    val b = g.select(col("p_brand"), col("p_name").as("b_name"), col("c").as("cb"))
      .withColumn("band", expr(s"length(b_name) div $w"))
    // A post-join `filter(levenshtein(..) <= d)` gets pushed INTO the join
    // condition, where it (a) runs before the cheap name-inequality check
    // and (b) is re-evaluated in the downstream projection — the DP matrix
    // per pair twice. Keeping the threshold inside conditional aggregates
    // leaves the join condition to the cheap inequality and evaluates
    // levenshtein exactly once per distinct pair, guarded by a lossless
    // length-difference lower bound (edit distance >= |len(a) - len(b)|,
    // so the when() short-circuits the DP for most of the block).
    val lenOk = abs(length(col("a_name")) - length(col("b_name"))) <= maxDist
    // banded threshold form: O(maxDist·n) diagonal band instead of the
    // O(m·n) full DP; returns -1 when the distance exceeds the threshold
    val dist = when(lenOk, levenshtein(col("a_name"), col("b_name"), maxDist))
    val hit = col("dist").isNotNull && col("dist") =!= -1
    val cross = a.join(b, Seq("p_brand", "band"))
      .filter(col("a_name") < col("b_name")) // each unordered name pair once
      .select(col("p_brand"), dist.as("dist"), (col("ca") * col("cb")).as("w"))
    // same-name row pairs: distance 0, C(c,2) of them per group
    val dups = g.filter(col("c") >= 2)
      .select(col("p_brand"), lit(0).as("dist"), expr("c * (c - 1) div 2").as("w"))
    cross.unionAll(dups)
      .groupBy(col("p_brand"))
      .agg(
        sum(when(hit, col("w"))).cast("long").as("n_pairs"),
        min(when(hit, col("dist"))).as("min_dist"),
        sum(when(hit, col("dist").cast("long") * col("w"))).as("sum_dist"))
      .filter(col("n_pairs") > 0)
      .orderBy(col("p_brand"))
  }
}
