package graft

import graft.ops.BloomJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame =
    (0L until 500L).map(i => (i, s"doc $i body", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")

  // every 3rd doc's text is in the blocklist, plus keys absent from the corpus
  private def blocklist: DataFrame =
    ((0L until 500L by 3).map(i => s"doc $i body") ++
      (0 until 200).map(i => s"other $i")).toDF("text")

  private def plainAnti: Seq[Long] =
    corpus.join(blocklist, Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("bloomAntiJoin equals the plain left_anti join") {
    val got = BloomJoin.bloomAntiJoin(corpus, blocklist, "text")
    assert(got.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == plainAnti)
  }

  test("result stays exact under a deliberately terrible fpp") {
    // fpp 0.5 floods the adjudication branch with false positives; the
    // exact join must absorb them all without changing the answer
    val got = BloomJoin.bloomAntiJoin(corpus, blocklist, "text", fpp = 0.5)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == plainAnti)
  }

  test("explicit expectedItems skips the count job and stays exact") {
    val got = BloomJoin.bloomAntiJoin(corpus, blocklist, "text",
      expectedItems = 400L)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == plainAnti)
  }

  test("no false negatives: every blocklisted key is bloom-flagged") {
    val bloom = BloomJoin.buildBloom(blocklist, col("text"))
    val missed = blocklist
      .where(!BloomJoin.mightContain(bloom, col("text")))
      .count()
    assert(missed == 0L)
  }

  test("prefilter passes clean rows without reaching the join") {
    // at fpp 0.01 over 367 blocklist keys, most of the 333 clean corpus
    // rows must take the shuffle-free branch (false positives ~1 %)
    val bloom = BloomJoin.buildBloom(blocklist, col("text"))
    val flagged = corpus
      .where(BloomJoin.mightContain(bloom, col("text")))
      .count()
    val trueHits = 500L / 3 + 1 // docs 0,3,...,498
    assert(flagged >= trueHits, "must flag every true hit")
    assert(flagged <= trueHits + 30, s"false positives out of band: $flagged")
  }

  test("bloomSemiJoin equals the plain left_semi join") {
    val want = corpus.join(blocklist, Seq("text"), "left_semi")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val got = BloomJoin.bloomSemiJoin(corpus, blocklist, "text")
    assert(got.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == want)
  }

  test("works on non-string keys (long ids)") {
    val left = (0L until 100L).map(i => (i, i % 7)).toDF("id", "grp")
    val block = Seq(1L, 5L, 50L, 999L).toDF("id")
    val want = left.join(block, Seq("id"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    val got = BloomJoin.bloomAntiJoin(left, block, "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want)
  }
}
