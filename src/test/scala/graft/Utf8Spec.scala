package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Multi-byte (UTF-8) correctness of the char-domain text operators.
  *
  * The harness corpus is pure ASCII (asserted in ContractSpec), so the
  * oracle gates never exercise multi-byte text. This spec pins the char
  * semantics directly: Spark's string ops work on codepoints, so every
  * structural result (token counts, shingle sets, dedup groups, BPE
  * pairs, substring boundaries) must be IDENTICAL between an ASCII
  * corpus and its accented twin built by a bijective char substitution.
  */
class Utf8Spec extends SparkSpec {
  import spark.implicits._

  // bijective ASCII → multi-byte substitution: preserves word and char
  // STRUCTURE while making most codepoints 2-byte
  private val sub = Map('a' -> 'á', 'e' -> 'é', 'i' -> 'í', 'o' -> 'ö',
    'u' -> 'ü', 'n' -> 'ñ', 'c' -> 'ç')
  private def accent(s: String): String = s.map(c => sub.getOrElse(c, c))

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "pack my box with five dozen liquor jugs",
    "pack my box with five dozen liquor jugs", // exact dup of doc 2
    "some unrelated document about spark engines")

  private def corpus(ts: Seq[String]) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  private lazy val ascii = corpus(texts)
  private lazy val utf8 = corpus(texts.map(accent))

  test("length counts codepoints, octet_length counts bytes (incl. astral plane)") {
    val r = Seq(("héllo wörld", "a😀b")).toDF("t", "e")
      .select(length($"t"), octet_length($"t"), length($"e"), octet_length($"e"))
      .head()
    assert(r.getInt(0) === 11 && r.getInt(1) === 13) // 2 two-byte chars
    assert(r.getInt(2) === 3 && r.getInt(3) === 6)   // emoji: 1 char, 4 bytes
  }

  test("token and subtoken counts identical for the accented twin") {
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", TextAnalysis.tokenCount($"text").as("t"),
          TextAnalysis.subtokenCount($"text").as("s"))
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(counts(ascii) === counts(utf8))
  }

  test("shingle boundaries fall on words, never inside a codepoint") {
    val got = utf8.filter($"doc_id" === 0L)
      .select(Dedup.shingleArray($"text")).as[Seq[String]].head()
    val want = accent(texts.head).split(" ").sliding(3)
      .map(_.mkString(" ")).toSeq.distinct
    assert(got === want) // exact strings — mojibake would break equality
  }

  test("exact-dedup groups identical for the accented twin") {
    def groups(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("keep"), count(lit(1)).as("n"))
        .select($"keep", $"n").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(groups(ascii) === groups(utf8))
    assert(groups(utf8) === Seq((0L, 1L), (1L, 1L), (2L, 2L), (4L, 1L)))
  }

  test("minhash signature equality structure identical for the accented twin") {
    def sigPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val sigs = Dedup.minhashSignatures(df).collect()
        .map(r => r.getLong(0) -> (1 to Dedup.MinhashK).map(r.getString)).toMap
      (for {
        a <- sigs.keys; b <- sigs.keys if a < b && sigs(a) == sigs(b)
      } yield (a, b)).toSet
    }
    assert(sigPairs(ascii) === sigPairs(utf8))
    assert(sigPairs(utf8) === Set((2L, 3L))) // only the exact dup collides fully
  }

  test("pairwise shingle Jaccard identical for the accented twin") {
    def jac(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
      val sets = df.select($"doc_id", Dedup.shingleArray($"text"))
        .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet).toMap
      (for { a <- sets.keys; b <- sets.keys if a < b } yield
        (a, b) -> sets(a).intersect(sets(b)).size.toDouble /
          sets(a).union(sets(b)).size).toMap
    }
    assert(jac(ascii) === jac(utf8))
  }

  test("BPE pair extraction never splits a codepoint") {
    val words = Seq(("héllo", 3L), ("wörld", 2L)).toDF("w", "wc")
    val pairs = TextAnalysis.bpePairStatsFromWords(words, topN = 40)
      .as[(String, Long)].collect().toMap
    assert(pairs === Map("hé" -> 3L, "él" -> 3L, "ll" -> 3L, "lo" -> 3L,
      "wö" -> 2L, "ör" -> 2L, "rl" -> 2L, "ld" -> 2L))
  }

  test("substring chunking reassembles the original multi-byte text") {
    val t = accent(texts.head)
    val r = Seq(t).toDF("text")
      .select(concat($"text".substr(lit(1), lit(10)),
        $"text".substr(lit(11), length($"text"))).as("rt"))
      .as[String].head()
    assert(r === t)
  }

  test("longest-dup-span structure identical for the accented twin") {
    def spans(df: org.apache.spark.sql.DataFrame) =
      graft.ops.DupSpans.longestDupSpanFromDocs(df)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(spans(ascii) === spans(utf8))
  }

  test("fingerprints: equal for identical UTF-8 text, distinct across an accent change") {
    val fp = utf8.select($"doc_id", TextAnalysis.fingerprint($"text"))
      .as[(Long, String)].collect().toMap
    assert(fp(2L) === fp(3L))
    val asciiFp = ascii.select($"doc_id", TextAnalysis.fingerprint($"text"))
      .as[(Long, String)].collect().toMap
    assert(fp(0L) !== asciiFp(0L)) // é-for-e changes the content hash
  }
}
