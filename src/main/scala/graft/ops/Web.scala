package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Web-crawl curation operators: URL parsing/canonicalization,
  * registered-domain rollups, and per-domain document quotas — the
  * CCNet/RefinedWeb-style curation steps that sit in front of every
  * web-scale LLM corpus build (the reference's pipeline ingests exchange
  * REST feeds, `/root/reference/kafka-producer.py:21-38`; the curation
  * face generalizes that ingest to crawled documents).
  *
  * The harness `documents` table carries no URL column, so each gate
  * derives a deterministic synthetic URL from (source, lang, doc_id) —
  * the SAME closed-form construction the DuckDB oracle replays — and the
  * operators under test are everything downstream of that column:
  * parse, canonicalize, group by registered domain, cap per domain.
  *
  * Scale shape: every step is row-local column algebra (parse_url /
  * regexp / array ops, all whole-stage-codegen) until the one shuffle
  * that the semantics require — a groupBy on registered_domain (domain
  * cardinality ≪ corpus; AQE handles the inevitable head-domain skew)
  * or the [[graft.plans.TopKPerKey]] bounded-heap quota, whose partial
  * pass prunes each map task's output to ≤ k rows per domain BEFORE the
  * shuffle — at 100 TB the exchange carries O(domains · k) rows, not the
  * corpus.
  */
object Web {

  /** Deterministic synthetic URL (mirrored literally in the oracles).
    *
    * Diversity by construction: mixed-case `WWW.` prefix on even ids,
    * 7 subdomains × |source| registrable labels × 3 public suffixes
    * (including the two-label `co.uk`), tracking params (`utm_source`,
    * `ref`) on even ids, `#frag` on ids ≡ 0 (mod 11). */
  private[ops] def urlOf: Column = concat(
    lit("https://"),
    when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
    lit("sub"), (col("doc_id") % 7).cast("string"),
    lit("."), col("source"),
    when(col("doc_id") % 3 === 0, lit(".com"))
      .when(col("doc_id") % 3 === 1, lit(".co.uk"))
      .otherwise(lit(".org")),
    lit("/"), col("lang"), lit("/page-"), (col("doc_id") % 40).cast("string"),
    lit("?"),
    when(col("doc_id") % 2 === 0,
        concat(lit("utm_source=feed&id="), (col("doc_id") % 100).cast("string"), lit("&ref=x")))
      .otherwise(concat(lit("id="), (col("doc_id") % 100).cast("string"), lit("&q="), col("lang"))),
    when(col("doc_id") % 11 === 0, lit("#frag")).otherwise(lit("")))

  /** Lowercased host with any leading `www.` stripped. */
  private def hostNorm(host: Column): Column =
    regexp_replace(lower(host), "^www\\.", "")

  /** Registered domain from a normalized host: last two labels, or last
    * three when the two-label tail is a known public suffix. The real
    * public-suffix list (~9k entries) would be a broadcast lookup keyed
    * the same way; the closed-form two-entry set keeps the gate
    * oracle-replayable. */
  private def registeredDomain(hostNorm: Column): Column = {
    val labels = split(hostNorm, "\\.")
    val n = size(labels)
    // greatest() keeps every slice start >= 1: Spark's slice rejects a
    // 0 start at runtime, which a single-label host ('localhost') or a
    // bare public suffix ('co.uk') would otherwise produce — unreachable
    // with the synthetic urlOf, latent for any real-host reuse
    val last2 = concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2)))
    when(n < 2, hostNorm)
      .when(last2.isin("co.uk", "com.au") && n >= 3,
        concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(last2)
  }

  /** Per-document URL decomposition + canonical form, gated as
    * q_url_canon. Canonicalization: host lowercased and `www.`-stripped,
    * fragment dropped, tracking params (`utm_*`, `ref`) removed with the
    * survivors kept in their original order. Pure row-local expressions
    * — zero shuffles; the whole gate is one codegen stage over the scan. */
  def urlCanon(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).withColumn("url", urlOf)
    // url_part = graft's codegen'd single-scan decomposition; parse_url
    // is its non-codegen regex twin (parity pinned in FunctionsSpec)
    val host = graft.functions.UrlPart(spark, col("url"), "HOST")
    val path = graft.functions.UrlPart(spark, col("url"), "PATH")
    val query = graft.functions.UrlPart(spark, col("url"), "QUERY")
    val params = split(query, "&")
    val kept = filter(params, p =>
      !p.startsWith("utm_") && !p.startsWith("ref="))
    docs.select(
        col("doc_id"),
        col("url"),
        hostNorm(host).as("host"),
        path.as("path"),
        size(params).cast("long").as("n_params"),
        (size(params) - size(kept)).cast("long").as("n_dropped"),
        concat(lit("https://"), hostNorm(host), path,
          when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
            .otherwise(lit(""))).as("canon_url"))
      .orderBy(col("doc_id"))
  }

  /** Canonical-URL dedup census, gated as q_dedup_url: the crawl-side
    * dedup that runs BEFORE any content hashing — documents whose URLs
    * canonicalize identically (host case/www, fragments, tracking
    * params stripped) are re-crawls of one page, so the pipeline keeps
    * one survivor per canonical URL and charges the duplicates to their
    * registered domain (re-crawl rate is a per-domain crawl-policy
    * signal). Survivor rule: min doc_id, the repo-wide convention
    * (ops/Dedup.scala survivors).
    *
    * Scale shape: one groupBy(canon_url) over [[urlCanon]]'s zero-
    * shuffle projection — the string key is the only corpus-scale
    * shuffle — then a map-side-combinable rollup on the bounded
    * registered-domain key. min(survivor) per domain is a checksum that
    * any survivor-selection mistake shifts. */
  def dedupUrl(spark: SparkSession, dir: String): DataFrame = {
    val perUrl = urlCanon(spark, dir)
      .select(col("doc_id"), col("host"), col("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("survivor"),
        max(col("host")).as("host")) // host is a function of canon_url
    perUrl
      .withColumn("registered_domain", registeredDomain(col("host")))
      .groupBy(col("registered_domain"))
      .agg(sum(col("n_copies")).as("n_docs"),
        count(lit(1)).as("n_urls"),
        (sum(col("n_copies")) - count(lit(1))).as("dup_docs"),
        max(col("n_copies")).as("max_copies"),
        min(col("survivor")).as("first_survivor"))
      .orderBy(col("registered_domain"))
  }

  /** Registered-domain rollup, gated as q_domain_stats: docs, distinct
    * hosts, distinct languages, and char mass per registered domain.
    * One map-side-combinable groupBy on a low-cardinality key; the
    * distinct-host count rides the same shuffle as a two-level
    * aggregate. */
  def domainStats(spark: SparkSession, dir: String): DataFrame = {
    val host = hostNorm(
      graft.functions.UrlPart(spark, urlOf, "HOST"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        host.as("host"),
        registeredDomain(host).as("registered_domain"))
      .groupBy(col("registered_domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("registered_domain"))
  }

  /** RefinedWeb-style per-domain quota, gated as q_domain_cap: keep at
    * most `cap` documents per registered domain, priority = longest
    * first (n_chars DESC, doc_id ASC tie-break), and report the funnel
    * per domain. The kept set comes from the sort-free
    * [[graft.plans.TopKPerKey]] operator — per-key bounded heaps with a
    * map-side partial pass, so the exchange carries ≤ cap rows per
    * domain per task instead of the corpus; the totals side is a plain
    * count groupBy whose exchange the tiny aggregate also bounds. The
    * final join is domain-keyed (broadcast at any realistic domain
    * count). */
  def domainCap(spark: SparkSession, dir: String, cap: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        registeredDomain(hostNorm(
          graft.functions.UrlPart(spark, urlOf, "HOST")))
          .as("registered_domain"))
    val kept = graft.plans.Graft.topKPerKey(docs,
        keyCols = Seq("registered_domain"),
        orderCols = Seq(("n_chars", true), ("doc_id", false)), k = cap)
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    val totals = docs.groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_total"), sum(col("n_chars")).as("total_chars"))
    totals.join(kept, Seq("registered_domain"))
      .select(col("registered_domain"), col("n_total"), col("n_kept"),
        (col("n_total") - col("n_kept")).as("n_dropped"),
        col("kept_chars"), col("total_chars"))
      .orderBy(col("registered_domain"))
  }
}
