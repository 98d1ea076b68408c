package graft

import org.apache.spark.sql.functions._

import graft.ops.Web

/** Properties of the web-crawl curation pack (ops/Web.scala). */
class WebSpec extends SparkSpec {
  import spark.implicits._

  test("urlCanon strips fragments and tracking params, lowercases host") {
    val rows = Web.urlCanon(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val canon = r.getAs[String]("canon_url")
      val host = r.getAs[String]("host")
      assert(!canon.contains("#"), s"fragment survived: $canon")
      assert(!canon.contains("utm_"), s"tracking param survived: $canon")
      assert(!canon.contains("ref="), s"ref param survived: $canon")
      assert(host == host.toLowerCase, s"host not lowercased: $host")
      assert(!host.startsWith("www."), s"www not stripped: $host")
      assert(canon.startsWith(s"https://$host/"), s"canon/host disagree: $canon")
    }
    // tracking params exist on even ids by construction: some dropped
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0)
    // odd ids carry no tracking params: some rows drop nothing
    assert(rows.exists(_.getAs[Long]("n_dropped") == 0L))
  }

  test("domainStats partitions the corpus; suffixes include co.uk 3-label domains") {
    val rows = Web.domainStats(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs,
      "registered domains must partition the corpus")
    val doms = rows.map(_.getAs[String]("registered_domain"))
    assert(doms.forall(d => d.matches("src\\d+\\.(com|org|co\\.uk)")),
      s"unexpected domain shape: ${doms.filterNot(_.matches("src\\d+\\.(com|org|co\\.uk)")).take(3).mkString(",")}")
    assert(doms.exists(_.endsWith(".co.uk")),
      "public-suffix 3-label extraction never exercised")
    // hosts collapse www/case variants: each domain has at most 7 subdomains
    rows.foreach(r => assert(r.getAs[Long]("n_hosts") <= 7))
  }

  test("domainCap quota binds, agrees with the window form, and bounds the funnel") {
    val rows = Web.domainCap(spark, sf, cap = 3).collect()
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(total, 3L), s"quota broken: total=$total kept=$kept")
      assert(r.getAs[Long]("n_dropped") == total - kept)
      assert(r.getAs[Long]("kept_chars") <= r.getAs[Long]("total_chars"))
    }
    assert(rows.exists(_.getAs[Long]("n_dropped") > 0), "cap never bound — gate is vacuous")
    // the sort-free TopKPerKey path and the row_number window form agree
    // on the kept multiset (same guarantee TopKSpec pins for events)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val viaOp = Web.domainCap(spark, sf, cap = 3).collect().toSeq
    assert(viaOp.map(_.getAs[Long]("n_kept")).sum <= docs.count())
  }

  test("chi2Terms: five ranked terms per language, non-negative statistic") {
    val rows = graft.ops.TextAnalysis.chi2Terms(spark, sf).collect()
    val langs = rows.map(_.getAs[String]("lang")).distinct
    assert(langs.length >= 2, "need multiple classes for a meaningful chi2")
    langs.foreach { l =>
      val ranks = rows.filter(_.getAs[String]("lang") == l).map(_.getAs[Long]("rnk")).sorted
      assert(ranks.sameElements(1L to ranks.length), s"ranks not dense for $l")
      assert(ranks.length <= 5)
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      assert(r.getAs[Long]("docs_in_class") <= r.getAs[Long]("docs_with_term"))
    }
  }

  test("dedupUrl: domain census conserves docs; survivors are canonical-group minima") {
    val rows = Web.dedupUrl(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val total = graft.util.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === total, "domains partition the corpus")
    rows.foreach { case (dom, nDocs, nUrls, dup, maxC, _) =>
      assert(nUrls >= 1 && nUrls <= nDocs)
      assert(dup === nDocs - nUrls)
      assert(maxC >= 1 && maxC <= nDocs)
      assert(dom.count(_ == '.') >= 1)
    }
    // survivor rule cross-check against a per-URL recount
    val perUrl = Web.urlCanon(spark, sf)
      .select($"doc_id", $"canon_url")
      .as[(Long, String)].collect().groupBy(_._2)
    val expectedSurvivors = perUrl.values.map(_.map(_._1).min).toSet
    val firstByDomain = rows.map(r => r._1 -> r._6).toMap
    firstByDomain.values.foreach(s =>
      assert(expectedSurvivors.contains(s), s"survivor $s not a group min"))
  }
}
