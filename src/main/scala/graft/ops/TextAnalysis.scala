package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting.
  *
  * Everything here is pure `functions._` column algebra — whole-stage
  * codegen'd, no UDFs, no shuffle except the final aggregations. At 100 TB
  * these run as a single projection pass over the parquet scan with only
  * `text` (+ referenced metadata columns) in `ReadSchema`.
  */
object TextAnalysis {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subtoken count: alpha runs, single digits, and isolated
    * punctuation each count as one subtoken (a cheap stand-in for a real
    * tokenizer's token count, good enough for data budgeting). */
  def subtokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]|[^a-z0-9 ]"))

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks)
  }

  /** Mean token length: (chars − separators) / tokens. */
  def avgWordLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - 1)).cast("double") / n
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      length(text)

  /** Composite quality score in [0,1]: length sweet-spot, some stopwords,
    * low punctuation — the usual cheap pre-filter for LLM training data. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 10.0, lit(1.0))
    round(lenScore * 0.5 + stopScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2, 6)
  }

  /** Marker-word language ID (n-gram/stopword heuristic). Deterministic
    * argmax with fixed precedence; 'unknown' when no marker fires. */
  def langId(text: Column): Column = {
    def score(markers: Seq[String]): Column =
      size(filter(tokens(text), t => t.isin(markers: _*)))
    val en = score(Seq("the", "a", "and"))
    val es = score(Seq("el", "la", "los"))
    val fr = score(Seq("le", "les", "et"))
    val de = score(Seq("der", "die", "und"))
    when(en >= es && en >= fr && en >= de && en > 0, "en")
      .when(es >= fr && es >= de && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("unknown")
  }

  /** Content fingerprint: md5 of case-normalized text, plus a 8-hex-char
    * bucket prefix usable as a shard/partition key. */
  def fingerprint(text: Column): Column = md5(lower(text))
  def fingerprintBucket(text: Column): Column = substring(fingerprint(text), 1, 8)

  /** Polynomial rolling-hash fingerprint: fold `h = (h*31 + byte) mod
    * (1e9+7)` over the characters — the incremental document hash that,
    * unlike md5, extends to windowed/winnowing schemes. Pure column
    * algebra (sequence + aggregate HOF), no UDF. */
  def rollingHash(text: Column): Column = {
    val M = 1000000007L
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(
        sequence(lit(1), length(text)),
        lit(0L),
        (acc, i) => pmod(acc * 31 + ascii(text.substr(i, lit(1))), lit(M))))
  }

  /** Deterministic content-hash train/validation split: assignment
    * depends only on the text (stable across runs, machines, and
    * re-partitioning — the property a training pipeline needs so a
    * document never migrates between splits). First md5 nibble in
    * {0,1} → 'val' (12.5%), else 'train'. */
  def trainSplit(text: Column): Column =
    when(substring(md5(text), 1, 1).isin("0", "1"), "val").otherwise("train")

  /** Normalization pass: lowercase, strip punctuation, collapse runs of
    * whitespace (spaces/tabs/newlines), trim — the canonical form fed to
    * dedup/fingerprinting. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,!?;:]", ""), "\\s+", " "))

  // ---- query shapes ----------------------------------------------------

  /** Per-document text feature table. */
  def docFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        subtokenCount(col("text")).as("n_subtokens"),
        round(avgWordLen(col("text")), 6).as("avg_word_len"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"),
        fingerprintBucket(col("text")).as("fp_bucket"),
        rollingHash(col("text")).as("rhash"))
      .orderBy(col("doc_id"))

  /** Per-document split assignment + normalized-content fingerprint. */
  def splitAssignments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        trainSplit(col("text")).as("split"),
        md5(normalize(col("text"))).as("norm_fp"),
        length(normalize(col("text"))).as("norm_len"))
      .orderBy(col("doc_id"))

  /** Corpus rollup per (lang, source) — count/χ stats over features. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        round(avg(tokenCount(col("text"))), 6).as("avg_tokens"),
        sum(tokenCount(col("text"))).as("total_tokens"))
      .orderBy(col("lang"), col("source"))
}
