package graft

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality scores: tokens, stopword ratio, non-alnum ratio") {
    val docs = Seq((1L, "The cat sat on the mat!", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.qualityScores(docs)
      .as[(Long, Int, Double, Double, Double)].collect().head
    val (_, nTokens, avgLen, stopRatio, nonAlnum) = got
    assert(nTokens == 6) // the cat sat on the mat
    assert(stopRatio == 0.5) // the, on, the
    assert(avgLen == 2.8333) // (3+3+3+2+3+3)/6
    assert(nonAlnum > 0.2 && nonAlnum < 0.3) // 6 non-alnum chars of 23
  }

  test("language id picks the language with most marker hits") {
    val docs = Seq(
      (1L, "the cat and the dog is here", "x"),
      (2L, "der hund und die katze ist da", "x"),
      (3L, "xyzzy qwerty", "x")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langId(docs).as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("fingerprint is normalization-invariant") {
    val docs = Seq(
      (1L, "Hello,  World!", "x"),
      (2L, "hello world", "x"),
      (3L, "goodbye world", "x")
    ).toDF("doc_id", "text", "lang")
    val fps = TextAnalysis.fingerprints(docs).as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("tfidf: empty documents count toward N but emit no terms") {
    // 4 docs, one token-less: idf = ln(4/df), NOT ln(3/df) — an engine that
    // derives N from the exploded term table silently shifts every score
    val docs = Seq(
      (1L, "alpha beta", "en"),
      (2L, "alpha gamma", "en"),
      (3L, "beta gamma", "en"),
      (4L, "!!! ...", "en") // zero tokens after normalization
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tfIdfTopTerms(docs, 2)
      .as[(Long, String, Double, Int)].collect()
    assert(!got.exists(_._1 == 4L)) // no rows for the empty doc
    // every term appears in 2 of 4 docs: tfidf = 1 * ln(4/2) = 0.6931
    assert(got.forall(_._3 == 0.6931), got.mkString(", "))
    assert(got.count(_._1 == 1L) == 2)
  }

  test("cleanCorpus: quality gates then exact dedup, text never re-shuffled") {
    import graft.ops.Curation
    val long = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, long, "en", "s0"),                    // survivor
      (2L, long, "en", "s1"),                    // exact dup of 1 → dropped
      (3L, "too short", "en", "s0"),             // < minTokens
      (4L, "!!! ??? *** $$$ %%% ^^^ &&& ((( ))) === +++ ~~~", "en", "s0"), // punct
      (5L, long + " extra", "de", "s2")          // survivor
    ).toDF("doc_id", "text", "lang", "source")
    val kept = Curation.cleanCorpus(docs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 5L))
    val stats = Curation.cleanCorpusStats(docs)
      .as[(String, String, Long)].collect().toSet
    assert(stats == Set(("en", "s0", 1L), ("de", "s2", 1L)))
  }

  test("token stats per language") {
    val docs = Seq(
      (1L, "one two three", "en"),
      (2L, "uno dos", "es")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenStats(docs)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("en") == ("en", 1L, 3L, 3.0))
    assert(got("es") == ("es", 1L, 2L, 2.0))
  }
}
