package graft

import org.apache.spark.sql.functions._
import graft.ops.WebCuration

/** URL canonicalization, registered-domain extraction, and per-domain
  * contribution caps (round-9j web-provenance wave).
  */
class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(Tuple1(url)).toDF("url")
      .select(WebCuration.normalizeUrl(col("url")).as("n"))
      .as[String].collect().head

  test("normalizeUrl: case, default port, fragment, tracking params, " +
      "param sort, trailing slash") {
    assert(norm("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#f") ==
      "https://www.example.com/A/b?a=1&b=2") // path case PRESERVED
    assert(norm("http://example.com:80/") == "http://example.com/")
    assert(norm("http://example.com:8080/path") ==
      "http://example.com:8080/path") // non-default port kept
    assert(norm("https://example.com") == "https://example.com/")
    assert(norm("https://example.com/p?utm_campaign=z&gclid=1&fbclid=2") ==
      "https://example.com/p") // all params tracked away -> no '?'
    assert(norm("https://news.bbc.co.uk/Story/") ==
      "https://news.bbc.co.uk/Story")
  }

  test("registeredDomain: eTLD+1 under plain and multi-label suffixes") {
    val got = Seq("www.example.com", "a.b.example.com", "news.bbc.co.uk",
      "bbc.co.uk", "localhost", "example.org", "ac.uk")
      .toDF("host")
      .select(WebCuration.registeredDomain(col("host")).as("rd"))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "example.com", "bbc.co.uk",
      "bbc.co.uk", "localhost", "example.org", "ac.uk"))
  }

  test("urlCanonical + domainStats: dup URLs collapse per domain") {
    val docs = Seq(
      (1L, "https://a.org/p?utm_source=x", 10L),
      (2L, "HTTPS://A.ORG/p", 20L), // same canonical URL as doc 1
      (3L, "https://www.a.org/q", 30L), // same domain, second host
      (4L, "https://b.co.uk/r#frag", 40L))
      .toDF("doc_id", "url", "n_chars")
    val stats = WebCuration.domainStats(docs, "doc_id", "url", "n_chars")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats("a.org") == (("a.org", 3L, 2L, 2L, 60L)))
    assert(stats("b.co.uk") == (("b.co.uk", 1L, 1L, 1L, 40L)))
  }

  test("domainCap: per-domain keep <= cap, deterministic across layouts, " +
      "caps nest (smaller cap keeps a prefix of the larger)") {
    val docs = (1L to 5L).map(i => (i, s"https://hot.org/p/$i")) ++
      Seq((6L, "https://warm.org/x"), (7L, "https://warm.org/y"),
        (8L, "https://cold.org/z"))
    val df = docs.toDF("doc_id", "url")
    val kept3 = WebCuration.domainCap(df, "doc_id", "url", 3)
      .as[(Long, String)].collect().toSet
    val byDomain = kept3.groupBy(_._2).map { case (k, v) => k -> v.size }
    assert(byDomain == Map("hot.org" -> 3, "warm.org" -> 2, "cold.org" -> 1))
    // layout independence: a different physical partitioning keeps the
    // same ids (the decision is a pure function of content)
    val keptRepart = WebCuration.domainCap(df.repartition(7), "doc_id",
      "url", 3).as[(Long, String)].collect().toSet
    assert(keptRepart == kept3)
    // nesting: cap 2's kept set is a subset of cap 3's (hash-clock
    // prefix property — tightening a cap never swaps survivors)
    val kept2 = WebCuration.domainCap(df, "doc_id", "url", 2)
      .as[(Long, String)].collect().toSet
    assert(kept2.subsetOf(kept3) && kept2.size == 5)
  }

  test("domainCapApply: increments admit only into the remaining quota, " +
      "empty index = batch cap, quota never exceeded across batches") {
    val mk = (ids: Seq[Long], host: String) =>
      ids.map(i => (i, s"https://$host/p/$i")).toDF("doc_id", "url")
    val base = mk(1L to 5L, "hot.org")
    val inc = mk(6L to 9L, "hot.org")
      .union(mk(Seq(10L), "new.org"))
    // batch decision on base fills all 4 of cap 4
    val keptBase = WebCuration.domainCap(base, "doc_id", "url", 4)
    assert(keptBase.count() == 4)
    val idx = WebCuration.domainCapIndex(keptBase)
    // increment: hot.org has 0 quota left (4-4); new.org admits 1
    val keptInc = WebCuration.domainCapApply(inc, idx, "doc_id", "url", 4)
      .as[(Long, String)].collect()
    assert(keptInc.map(_._2).toSeq == Seq("new.org"))
    // cumulative per-domain totals never exceed the cap
    val total = (keptBase.as[(Long, String)].collect() ++ keptInc)
      .groupBy(_._2).view.mapValues(_.size).toMap
    assert(total.values.forall(_ <= 4))
    // empty index: apply IS the batch decision
    val emptyIdx = WebCuration.domainCapIndex(
      mk(Nil, "none").select($"doc_id", lit("none").as("reg_domain")))
    val applyFresh = WebCuration.domainCapApply(base, emptyIdx,
      "doc_id", "url", 4).as[(Long, String)].collect().toSet
    assert(applyFresh == WebCuration.domainCap(base, "doc_id", "url", 4)
      .as[(Long, String)].collect().toSet)
  }

  test("urlFrontierApply: seen URLs (under any variant) skipped, new " +
      "URLs keep-first within the increment") {
    val seen = Seq((1L, "https://a.org/x"), (2L, "https://a.org/y"))
      .toDF("doc_id", "url")
    val incr = Seq(
      (10L, "HTTPS://A.ORG/x?utm_source=s"), // canonical dup of seen x
      (11L, "https://a.org/z#f"),            // new
      (12L, "https://a.org/z"),              // same canonical as 11
      (13L, "https://b.org/w"))              // new
      .toDF("doc_id", "url")
    val idx = WebCuration.urlFrontierIndex(seen, "url")
    val got = WebCuration.urlFrontierApply(incr, idx, "doc_id", "url")
      .as[(Long, String)].collect().map(_._1).toSet
    assert(got == Set(11L, 13L))
  }

  test("urlCanonical streams stateless-append: MemoryStream = batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, "HTTPS://A.ORG:443/x/?utm_source=s&b=2&a=1#f"),
      (2L, "http://b.co.uk/y"))
    val in = MemoryStream[(Long, String)](95, spark, None)
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = WebCuration.urlCanonical(in.toDF().toDF("doc_id", "url"),
        "doc_id", "url")
      .select($"doc_id", $"norm_url", $"reg_domain")
      .writeStream.outputMode("append").foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          out ++= b.as[(Long, String, String)].collect(); ()
      }.start()
    try { in.addData(rows); q.processAllAvailable() } finally q.stop()
    val batch = WebCuration.urlCanonical(rows.toDF("doc_id", "url"),
        "doc_id", "url")
      .select($"doc_id", $"norm_url", $"reg_domain")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out.sortBy(_._1).toSeq == batch)
    assert(batch.head._2 == "https://a.org/x?a=1&b=2")
    assert(batch(1)._3 == "b.co.uk")
  }
}
