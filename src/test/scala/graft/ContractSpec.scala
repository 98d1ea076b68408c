package graft

/** Guards on the driver contract itself: every declared query must have
  * an oracle, run non-empty at the smoke scale, and be deterministic
  * across re-runs (the oracle hash-compare assumes all three). */
class ContractSpec extends SparkSpec {

  /** Queries intentionally without an oracle. Empty since round 5: the
    * sketch queries now carry bracket-style oracles (exact columns + 0/1
    * envelope flags derived from the sketch estimates), so EVERY query
    * is fully oracle-gated. The mechanism stays for future genuinely
    * un-oracle-able shapes. */
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle (or a declared rows-only reason)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnly).isEmpty, s"queries without oracle: ${q -- o -- rowsOnly}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
    assert((rowsOnly -- q).isEmpty && (rowsOnly & o).isEmpty)
  }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("documents corpus is single-byte text (precondition of the char-domain oracles)") {
    // the multimodal oracles slice TEXT by characters while the engine
    // slices PAYLOAD by bytes — equivalent only while chars == bytes
    val n = graft.util.Tables.documents(spark, sf)
      .filter("octet_length(encode(text, 'UTF-8')) <> length(text)").count()
    assert(n === 0, s"$n documents contain multi-byte characters")
  }

  test("every query returns rows at sf0.001 and is deterministic across re-runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf).collect()
      assert(a.nonEmpty, s"$name returned 0 rows at sf0.001")
      val b = fn(spark, sf).collect()
      assert(a.toSeq === b.toSeq, s"$name is nondeterministic")
    }
  }
}
