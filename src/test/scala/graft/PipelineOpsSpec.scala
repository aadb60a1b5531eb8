package graft

import org.apache.spark.sql.functions._
import graft.ops.{Core, Decontam}

/** Training-pipeline operators added in round 6: benchmark decontamination
  * (PII scrubbing and token-budget mixing specs live here too).
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ngrams: exact trigrams, short-doc guard") {
    val toks = Core.tokensUni(lit("a b c d e"))
    val got = spark.range(1).select(Decontam.ngrams(toks, 3).as("g"))
      .as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d", "c d e"))
    // fewer tokens than n → empty, NOT a descending-sequence crash
    val short = spark.range(1)
      .select(Decontam.ngrams(Core.tokensUni(lit("a b")), 3).as("g"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
    val exact = spark.range(1)
      .select(Decontam.ngrams(Core.tokensUni(lit("a b c")), 3).as("g"))
      .as[Seq[String]].head()
    assert(exact == Seq("a b c"))
  }

  test("contaminationCounts: distinct shared grams per doc, zero rows kept") {
    val eval = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      // shares "the quick brown" and "quick brown fox" (2 distinct grams)
      (1L, "we saw the quick brown fox yesterday maybe"),
      (2L, "nothing in common with anything here"),
      // exact duplicate of the eval doc: all 3 of its grams
      (3L, "the quick brown fox jumps"),
      // repeats a shared gram twice — still 1 DISTINCT gram
      (4L, "the quick brown stuff and the quick brown stuff")
    ).toDF("doc_id", "text")
    val got = Decontam.contaminationCounts(train, eval, "doc_id", "text", n = 3)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 1)), got) // "the quick brown", "quick brown fox"
    assert(got(2L) == ((0L, 0)))
    assert(got(3L) == ((3L, 1)))
    assert(got(4L) == ((1L, 1)))
    assert(got.size == 4) // one row per training doc, zero-overlap included
  }

  test("decontaminate drops exactly the overlapping docs; eval side broadcasts") {
    val eval = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "we saw the quick brown fox yesterday maybe"),
      (2L, "nothing in common with anything here"),
      (3L, "short doc")
    ).toDF("doc_id", "text")
    val survivors = Decontam.decontaminate(train, eval, "doc_id", "text", n = 3)
    assert(survivors.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // the eval gram set must be the broadcast side (bounded benchmark, not
    // a corpus-scale shuffle)
    val plan = Decontam
      .contaminationCounts(train, eval, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
