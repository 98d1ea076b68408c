package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Training-example preparation: the operators that turn a cleaned
  * corpus into model-ready sequences — PII scrubbing, fixed-budget
  * sequence packing, and overlapping retrieval chunking. All three are
  * pure column algebra / windowed aggregates with DuckDB-replayable
  * semantics; nothing is driver-side.
  */
object Prep {

  // -------------------------------------------------------------------
  // PII scan + redaction
  // -------------------------------------------------------------------

  /** Patterns shared verbatim by the Spark scan and the DuckDB oracle —
    * restricted to the regex subset where java.util.regex and RE2 agree
    * (character classes, bounded repeats, \b, \d; no backrefs or
    * lookaround). */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Rx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRx = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The synthetic corpus carries no PII, so the gated query plants
    * deterministic markers first (doc_id-derived email / IPv4 / phone on
    * residue classes) — the SCAN then runs for real over varying
    * per-document counts, and the oracle replays the same injection
    * closed-form. Injection is plain string algebra; swap this for the
    * raw text column on a real corpus. */
  def withPlantedPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("text",
      concat(col("text"),
        when(id % 3 === 0, concat(lit(" contact user"), id.cast("string"),
            lit("@example.com")))
          .otherwise(lit("")),
        when(id % 5 === 0, concat(lit(" from 10."), (id % 256).cast("string"),
            lit(".0."), (id % 100).cast("string")))
          .otherwise(lit("")),
        when(id % 7 === 0, concat(lit(" call 555-867-"),
            lpad((id % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))))
  }

  /** Per-document PII census + redaction. Counts via regexp_count
    * (codegen'd), redaction via chained regexp_replace with FIXED
    * replacement tokens (no backrefs — RE2-compatible, so the oracle can
    * replay with the 'g' flag). The redacted text leaves the query as an
    * md5 so the gate pins the exact output without hauling text through
    * the comparison. Zero shuffles: one projection over the scan, and
    * the ORDER BY rides the gate's small output. */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    withPlantedPii(Tables.documents(spark, dir))
      .select(col("doc_id"),
        regexp_count(t, lit(EmailRx)).cast("long").as("n_emails"),
        regexp_count(t, lit(Ipv4Rx)).cast("long").as("n_ips"),
        regexp_count(t, lit(PhoneRx)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          EmailRx, "<EMAIL>"), Ipv4Rx, "<IP>"), PhoneRx, "<PHONE>"))
          .as("redacted_md5"))
      .withColumn("n_pii", col("n_emails") + col("n_ips") + col("n_phones"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level PII rollup: document counts and totals per source —
    * the report a scrubbing pass logs. One map-side-combinable groupBy
    * over the per-doc census. */
  def piiSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    withPlantedPii(Tables.documents(spark, dir))
      .select(col("source"),
        regexp_count(t, lit(EmailRx)).cast("long").as("e"),
        regexp_count(t, lit(Ipv4Rx)).cast("long").as("i"),
        regexp_count(t, lit(PhoneRx)).cast("long").as("p"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("e") + col("i") + col("p") > 0).cast("long")).as("n_docs_with_pii"),
        sum(col("e")).as("n_emails"), sum(col("i")).as("n_ips"),
        sum(col("p")).as("n_phones"))
      .orderBy(col("source"))
  }

  // -------------------------------------------------------------------
  // Sequence packing
  // -------------------------------------------------------------------

  /** Pack documents into fixed-token-budget training sequences by
    * concat-and-chop (the GPT/T5 pretraining shape): within each
    * (lang, shard) stream, documents are laid head-to-tail in doc_id
    * order and the stream is cut every `budget` tokens — a document's
    * bin is where its first token lands. Emitted per bin: doc count,
    * token sum, fill rate against the budget. Complements
    * [[TextAnalysis.packSequences]] (gated as q_pack_sequences), which
    * emits the per-DOCUMENT bin-span view over source-partitioned
    * streams; this op (q_pack_bins) is the per-BIN census, and its
    * sub-sharding is the skew answer when one language dominates.
    *
    * Scale shape: the ONLY window is a cumsum partitioned by
    * (lang, shard) — `shards` sub-shards per language keep any one
    * partition at corpus_size/(|langs|·shards), the knob a 100 TB run
    * turns up; packing is per-shard in production for exactly this
    * reason. Token count is the whitespace tokenization the token-count
    * op uses. True next-fit (reset the accumulator at each boundary) is
    * sequentially recursive and NOT expressible as one pass — the
    * concat-and-chop bound wastes at most one document tail per bin,
    * which is why production packers accept it. */
  def packSequences(spark: SparkSession, dir: String, budget: Long = 512,
      shards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("doc_id") % shards).as("shard"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      // first token of this doc lands at stream offset cum-tok
      .withColumn("bin", floor((col("cum") - col("tok")) / budget).cast("long"))
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      // parts-per-million fill via integer DIV: tok_sum/budget in double
      // landed on exact 6-dp half-way ties (budget is a power of two ⇒
      // dyadic ratios), which different DuckDB builds round in opposite
      // directions — the repo's "no float on the comparison path" rule.
      .withColumn("fill_ppm", expr(s"tok_sum * 1000000L DIV ${budget}L"))
      .orderBy(col("lang"), col("shard"), col("bin"))
  }

  // -------------------------------------------------------------------
  // Retrieval chunking
  // -------------------------------------------------------------------

  /** Overlapping retrieval chunks: fixed `width`-CHAR windows every
    * `stride` chars (stride < width ⇒ the RAG-style overlap), one row
    * per chunk with its md5 — the embedding-pipeline input table.
    * Complements [[TextAnalysis.chunkOverlap]] (q_chunk_overlap), which
    * windows over TOKENS; char windows (q_chunk_chars) are what
    * byte/char-budgeted embedding models consume.
    * Chunk starts are 0, stride, 2·stride, … while start < n_chars, so
    * n_chunks = ⌈n_chars/stride⌉ and the tail chunk is naturally short.
    * Pure explode over a computed sequence — linear, no shuffle before
    * the gate's ORDER BY; chunking parallelizes per document. */
  def chunkOverlap(spark: SparkSession, dir: String, width: Int = 200,
      stride: Int = 150): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("text"), col("n_chars"),
        posexplode(sequence(lit(0L),
          floor((col("n_chars") - 1) / lit(stride.toLong)).cast("long")))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        length(col("text").substr((col("start") * stride + 1).cast("int"),
          lit(width))).cast("long").as("chunk_len"),
        md5(col("text").substr((col("start") * stride + 1).cast("int"),
          lit(width))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Out-of-fold target encoding, gated as q_target_encode: the
    * standard leakage-safe way to turn a categorical column into a
    * model feature — each fold's rows are encoded with the target mean
    * computed from the OTHER folds, plus an m-estimate smoothed
    * encoding toward the global prior for rare levels.
    *
    * Features: order priority and order month (both bounded-cardinality
    * categoricals of `orders`); target: order fully shipped
    * (status = 'F'); folds: `o_orderkey % folds` — deterministic, so
    * DuckDB replays them exactly.
    *
    * The leakage trick IS the scale story: out-of-fold means need no
    * per-row re-aggregation or fold loop, because
    * oof(level, fold) = (sy(level) − sy(level, fold)) /
    * (n(level) − n(level, fold)) — ONE map-side-combinable
    * groupBy(feature, level, fold) over the scan, then level totals as
    * a window over the |levels|·|folds|-bounded census (never the fact
    * table). A per-row encode is then a broadcast-join of this census
    * back onto the scan, zero additional shuffles. Quantization: the
    * encodes are ratios of exact BIGINT sums, re-quantized to 1e-6
    * units the engine-stable way (round to BIGINT, not round(x, 6)).
    *
    * A level seen in only one fold has no out-of-fold evidence: oof is
    * null there (guarded on both sides, never a division by zero). */
  def targetEncode(spark: SparkSession, dir: String, m: Int = 20,
      folds: Int = 5): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      (col("o_orderkey") % folds).as("fold"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
      col("o_orderpriority").as("priority"),
      date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    val features = Seq("priority", "month")
    val census = features.map { f =>
      o.groupBy(col(f).as("level"), col("fold"))
        .agg(count(lit(1)).as("n_f"), sum(col("y")).as("sy_f"))
        .select(lit(f).as("feature"), col("level"), col("fold"),
          col("n_f"), col("sy_f"))
    }.reduce(_ unionAll _)
    val lvl = Window.partitionBy(col("feature"), col("level"))
    val all = Window.partitionBy(col("feature"))
    def q6(c: Column): Column =
      (round(c * 1e6).cast("long").cast("double") / 1e6)
    census
      .withColumn("n", sum(col("n_f")).over(lvl))     // bounded frames:
      .withColumn("sy", sum(col("sy_f")).over(lvl))   // |levels|·|folds|
      .withColumn("gn", sum(col("n_f")).over(all))    // rows, never the
      .withColumn("gsy", sum(col("sy_f")).over(all))  // fact table
      .select(col("feature"), col("level"), col("fold"),
        col("n_f").as("n"), col("sy_f").as("y_sum"),
        when(col("n") === col("n_f"), lit(null).cast("double"))
          .otherwise(q6((col("sy") - col("sy_f")).cast("double")
            / (col("n") - col("n_f")).cast("double"))).as("oof"),
        q6((col("sy").cast("double")
            + lit(m.toDouble) * col("gsy").cast("double")
              / col("gn").cast("double"))
          / (col("n") + m).cast("double")).as("smoothed"))
      .orderBy(col("feature"), col("level"), col("fold"))
  }

  // -------------------------------------------------------------------
  // Content-defined chunking (FastCDC/Gear family)
  // -------------------------------------------------------------------

  /** Content-defined chunks, gated as q_cdc_chunks: cut a document
    * wherever the Gear rolling hash of the trailing `window` characters
    * has its low `cutBits` bits zero — the storage/dedup chunking that
    * re-synchronizes after insertions (a fixed-width chunker shifts
    * every boundary downstream of an edit; a content-defined one
    * realigns within one window, so an incremental recrawl re-uploads
    * only the edited chunks). Mean chunk length ≈ 2^cutBits.
    *
    * The windowed hash makes every cut decision LOCAL: position i cuts
    * iff (Σ_{k<window} gear(char_{i−k})·2^k mod 2^31) has low bits
    * zero — no sequential state, so the scan parallelizes per document
    * and per position (the reason this beats the textbook streaming
    * formulation on Spark). All arithmetic is masked integer adds and
    * shifts; gear values come from the repo's md5 convention, so the
    * oracle replays cuts bit-for-bit. Per-term mask keeps every
    * intermediate < 2^36 (DuckDB BIGINT overflow THROWS — no silent
    * wraparound to rely on).
    *
    * Scale: O(window · chars) lambda work per document, zero shuffles
    * before the gate's ORDER BY; the census twin (q_cdc_dedup) adds one
    * hash-keyed aggregate over 16-byte chunk fingerprints. */
  def cdcChunksOf(docs: DataFrame, window: Int = 31,
      cutBits: Int = 6): DataFrame = {
    val M31 = 2147483647L // 2^31 − 1
    val cutMask = (1L << cutBits) - 1
    val w = array((0 until window).map(k => lit(1L << k)): _*)
    val n = length(col("text")).cast("long")
    val garr = transform(split(col("text"), ""),
      c => conv(substring(md5(concat(lit("gear|"), c)), 1, 8), 16, 10)
        .cast("long").bitwiseAND(lit(M31)))
    // Docs shorter than the window carry no cut candidates. The guard is
    // load-bearing: sequence(window, n) with n < window is DESCENDING in
    // Spark, and the lambda would then probe element_at(garr, i-k) at
    // index 0 (runtime error) and negative offsets (wrap from the array
    // end) — while the oracle's range(window, n+1) is simply empty and
    // emits one whole-document chunk. Match that: zero cuts.
    val cuts = when(n < window, array().cast("array<long>"))
      .otherwise(filter(sequence(lit(window.toLong), n), i =>
        aggregate(sequence(lit(0), lit(window - 1)), lit(0L),
          (acc, k) => acc + (element_at(col("garr"), (i - k).cast("int"))
            * element_at(w, (k + 1).cast("int"))).bitwiseAND(lit(M31)))
          .bitwiseAND(lit(M31)).bitwiseAND(lit(cutMask)) === 0))
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), n.as("n"), garr.as("garr"))
      // the exchange is a MATERIALIZATION BARRIER, not (only) a spread:
      // without it Catalyst collapses this projection into the cuts
      // lambda and every element_at(garr, ·) re-evaluates the whole
      // per-char hash array — O(window·n²) md5 calls per document (the
      // shinglesWithCard lesson; measured as a hang, not a slowdown).
      // Shuffling the 8·n-byte array once beats re-hashing n times.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("cuts", cuts)
      .withColumn("st", concat(array(lit(0L)), col("cuts")))
      .withColumn("en", concat(col("cuts"), array(col("n"))))
      .select(col("doc_id"), col("text"),
        posexplode(zip_with(col("st"), col("en"),
          (s, e) => struct(s.as("cs"), e.as("ce")))))
      .filter(col("col.ce") > col("col.cs"))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.cs").as("start_pos"),
        (col("col.ce") - col("col.cs")).as("chunk_len"),
        md5(col("text").substr((col("col.cs") + 1).cast("int"),
          (col("col.ce") - col("col.cs")).cast("int"))).as("chunk_md5"))
  }

  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Two-snapshot incremental-transfer census, gated as
    * q_cdc_incremental: snapshot v2 edits one document in five
    * (deterministic head insertion, the withPlantedPii convention), and
    * the census measures what a chunk store actually re-uploads — the
    * distinct v2 chunk fingerprints absent from v1 — against the naive
    * fixed-width-64 chunker on the same edit. Content-defined
    * boundaries re-sync within one window, so only the head chunk(s) of
    * an edited document are new; fixed-width boundaries shift through
    * the whole document, re-uploading nearly all of it. The two
    * upload_ppm columns ARE the CDC value proposition as one gated row.
    * All outputs are exact integer counts/ppm divisions. */
  def cdcIncremental(spark: SparkSession, dir: String): DataFrame = {
    // Chunk the DELTA, not the snapshot: v2 differs from v1 only on the
    // edited docs (one in five), and chunk cuts are text-local, so an
    // unchanged document's chunks are byte-identical across snapshots.
    // One chunking pass over {v1 all} ∪ {v2 edited docs} = 1.2x the
    // corpus (the naive two-snapshot form paid 2.0x); snapshot
    // membership is then pure row algebra over the tag in the doc_id's
    // parity — a tag-0 chunk belongs to v1, and also to v2 when its
    // document is unchanged; a tag-1 chunk is v2-only. This is the
    // production shape: a chunk store chunks new/changed content only.
    val v1 = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v2e = v1.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
      concat(lit("REV2 EDIT "), col("text")).as("text"))
    val toChunk = v1.select((col("doc_id") * 2).as("doc_id"), col("text"))
      .unionAll(v2e.select((col("doc_id") * 2 + 1).as("doc_id"), col("text")))
    // (doc_id-tagged chunks) -> (ver, chunk_md5, clen) distinct sets
    def membership(tagged: DataFrame): DataFrame = tagged
      .select(col("chunk_md5"), col("clen0"), explode(
        when(col("doc_id") % 2 === 1, array(lit(1)))
          .when(floor(col("doc_id") / 2) % 5 === 0, array(lit(0)))
          .otherwise(array(lit(0), lit(1)))).as("ver"))
      .groupBy(col("ver"), col("chunk_md5"))
      .agg(min(col("clen0")).as("clen"))
      .localCheckpoint(eager = false)
    val gearSets = membership(cdcChunksOf(toChunk)
      .select(col("doc_id"), col("chunk_md5"),
        col("chunk_len").as("clen0")))
    val fixedSets = membership(toChunk.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0L),
          floor((length(col("text")) - 1) / 64).cast("long")))
          .as(Seq("i", "start")))
      .select(col("doc_id"),
        md5(col("text").substr((col("start") * 64 + 1).cast("int"), lit(64)))
          .as("chunk_md5"),
        length(col("text").substr((col("start") * 64 + 1).cast("int"), lit(64)))
          .cast("long").as("clen0")))
    def census(sets: DataFrame, label: String): DataFrame = {
      val a = sets.filter(col("ver") === 0).select(col("chunk_md5"))
      val b = sets.filter(col("ver") === 1)
        .select(col("chunk_md5"), col("clen"))
      val fresh = b.join(a, Seq("chunk_md5"), "left_anti")
      b.agg(count(lit(1)).as("chunks_v2"), sum(col("clen")).as("chars_v2"))
        .crossJoin(fresh.agg(
          coalesce(count(lit(1)), lit(0L)).as("chunks_new"),
          coalesce(sum(col("clen")), lit(0L)).as("chars_new")))
        .select(lit(label).as("chunker"), col("chunks_v2"), col("chunks_new"),
          col("chars_v2"), col("chars_new"),
          expr("chars_new * 1000000L div chars_v2").as("upload_ppm"))
    }
    census(gearSets, "cdc_gear").union(census(fixedSets, "fixed_64"))
      .orderBy(col("chunker"))
  }

  /** Chunk-level dedup census, gated as q_cdc_dedup: the storage-dedup
    * figure — distinct chunk fingerprints vs total, and the characters
    * a chunk store would actually hold vs the raw corpus. One aggregate
    * over 16-byte fingerprints. */
  def cdcDedup(spark: SparkSession, dir: String): DataFrame = {
    val ch = cdcChunksOf(Tables.documents(spark, dir))
    val per = ch.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("refs"), min(col("chunk_len")).as("clen"))
    per.agg(
        sum(col("refs")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        (sum(col("refs")) - count(lit(1))).as("dup_chunks"),
        sum(col("refs") * col("clen")).as("chars_total"),
        sum(col("clen")).as("chars_unique"))
      .withColumn("chars_saved", col("chars_total") - col("chars_unique"))
  }

  // ---- DuckDB oracle builder (generated: the chunk pipeline repeats
  // per snapshot and per chunker, so hand-maintaining it would drift) ----

  /** The Gear chunk-fingerprint set of one docs CTE, as SQL. */
  private def gearSetSql(src: String, pfx: String): String =
    s"""${pfx}g AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
       |  list_transform(range(1, CAST(length(text) + 1 AS BIGINT)), i ->
       |    ('0x' || substr(md5('gear|' || substr(text, CAST(i AS INTEGER), 1)),
       |             1, 8))::BIGINT & 2147483647) AS garr
       |  FROM $src WHERE length(text) > 0),
       |${pfx}c AS (SELECT doc_id, text, n,
       |  list_filter(range(31, CAST(n + 1 AS BIGINT)), i ->
       |    ((list_sum(list_transform(range(0, 31), k ->
       |        (garr[CAST(i - k AS INTEGER)]
       |         * (CAST(1 AS BIGINT) << CAST(k AS INTEGER))) & 2147483647))
       |      & 2147483647) & 63) = 0) AS cuts
       |  FROM ${pfx}g),
       |${pfx}s AS (SELECT doc_id, text,
       |        list_prepend(CAST(0 AS BIGINT), cuts) AS st,
       |        list_append(cuts, n) AS en
       |      FROM ${pfx}c),
       |${pfx}ch AS (SELECT doc_id, text,
       |         unnest(range(1, CAST(len(st) + 1 AS BIGINT))) AS j, st, en
       |       FROM ${pfx}s),
       |${pfx}set AS MATERIALIZED (
       |  SELECT md5(substr(text, CAST(st[CAST(j AS INTEGER)] + 1 AS INTEGER),
       |           CAST(en[CAST(j AS INTEGER)] - st[CAST(j AS INTEGER)]
       |                AS INTEGER))) AS chunk_md5,
       |    min(en[CAST(j AS INTEGER)] - st[CAST(j AS INTEGER)]) AS clen
       |  FROM ${pfx}ch WHERE en[CAST(j AS INTEGER)] > st[CAST(j AS INTEGER)]
       |  GROUP BY 1)""".stripMargin

  /** The fixed-width-64 chunk-fingerprint set of one docs CTE, as SQL. */
  private def fixedSetSql(src: String, pfx: String): String =
    s"""${pfx}fx AS (SELECT doc_id, text,
       |    unnest(range(0, (length(text) - 1) // 64 + 1)) AS i
       |  FROM $src WHERE length(text) > 0),
       |${pfx}set AS MATERIALIZED (
       |  SELECT md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS chunk_md5,
       |    CAST(min(length(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)))
       |         AS BIGINT) AS clen
       |  FROM ${pfx}fx GROUP BY 1)""".stripMargin

  private def censusSql(label: String, pfx: String): String =
    s"""SELECT '$label' AS chunker,
       |  (SELECT count(*) FROM ${pfx}2set) AS chunks_v2,
       |  (SELECT count(*) FROM ${pfx}2set b
       |   WHERE NOT EXISTS (SELECT 1 FROM ${pfx}1set a
       |                     WHERE a.chunk_md5 = b.chunk_md5)) AS chunks_new,
       |  (SELECT CAST(sum(clen) AS BIGINT) FROM ${pfx}2set) AS chars_v2,
       |  (SELECT CAST(coalesce(sum(clen), 0) AS BIGINT) FROM ${pfx}2set b
       |   WHERE NOT EXISTS (SELECT 1 FROM ${pfx}1set a
       |                     WHERE a.chunk_md5 = b.chunk_md5)) AS chars_new"""
      .stripMargin

  def cdcIncrementalSql: String =
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
       |v2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
       |         THEN 'REV2 EDIT ' || text ELSE text END AS text FROM v1),
       |${gearSetSql("v1", "g1")},
       |${gearSetSql("v2", "g2")},
       |${fixedSetSql("v1", "f1")},
       |${fixedSetSql("v2", "f2")}
       |SELECT chunker, chunks_v2, chunks_new, chars_v2, chars_new,
       |  (chars_new * 1000000) // chars_v2 AS upload_ppm
       |FROM (${censusSql("cdc_gear", "g")}
       |      UNION ALL
       |      ${censusSql("fixed_64", "f")})
       |ORDER BY chunker""".stripMargin
}
