// Round-12 stress A: the chrF pre-collapse kernel at 10× sf0.1 (the
// round-11 22.8 s row — target ≤12 s), TER at the same scale, ragged
// Krippendorff at 150k+ votes, and the consolidated perplexityBuckets
// on a 20M-distinct numeric score (the adaptive-PrefixSum proof the
// round-11 tableProfile row established, now on the LAST consolidated
// call site) with a closed-form parity check.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 8g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r12a.scala
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Core, Preference, Sampling, TextAnalysis}

val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
val docs = ((0 until 10).map { k =>
  docs0.select((col("doc_id") + k * 10000000L).as("doc_id"),
    concat(col("text"), lit(s" salt$k")).as("text"),
    col("lang"), col("source"), col("n_chars"))
}.reduce(_ unionByName _).localCheckpoint())
println("docs=" + docs.count())

def t(tag: String)(f: => Long): Unit = {
  val t0 = System.nanoTime; val n = f
  println(f"STRESS $tag: ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
}

val tk = Core.tokensUni(col("text"))
val cand = array_join(filter(tk, (_, i) => (i + 1) % 3 =!= 0), " ")
val pairs = docs.select(col("doc_id"), array_join(tk, " ").as("ref"),
  cand.as("cand")).localCheckpoint()

t("chrf 50k (CharNgramCounts + GramClipStats zero-exchange scan)") {
  TextAnalysis.chrF(pairs, "doc_id", "ref", "cand").count()
}
t("ter 50k (codegen Levenshtein, zero shuffle)") {
  TextAnalysis.ter(pairs, "doc_id", "ref", "cand").count()
}
t("gopher_rep 50k (GopherRepStats single-kernel battery)") {
  TextAnalysis.gopherRepetition(docs).count()
}
t("kripp ~170k ragged votes") {
  def lbl(j: Int) =
    (((col("doc_id") % (j + 2)) + (col("doc_id") % 3)) % 3).cast("int")
  val votes = docs.select(col("doc_id"), explode(array(
    lbl(0),
    when(col("doc_id") % 5 =!= 0, lbl(1)),
    when(col("doc_id") % 7 =!= 0, lbl(2)),
    when(col("doc_id") % 4 === 0, lbl(3)))).as("label"))
  Preference.krippAlpha(votes, "doc_id", "label").count()
}

// 20M-distinct numeric score through the CONSOLIDATED perplexityBuckets
// (verdict #1): every score distinct — the exact shape whose dictionary
// used to hit 64 fixed window partitions. Closed-form parity: with
// scores 0..N-1 (count 1 each), _cum(k) = k+1, so
// bucket(k) = floor(k·n/N) + 1 exactly.
val N = 20000000L
val n = 10
val scored = spark.range(N).select(col("id").cast("double").as("score"))
t(s"perplexityBuckets ${N / 1000000}M-distinct") {
  Sampling.perplexityBuckets(scored, "score", n).count()
}
val sample = (Sampling.perplexityBuckets(scored, "score", n)
  .where(pmod(col("score").cast("long"), lit(1999993L)) === 0)
  .collect())
val bad = sample.filter { r =>
  val k = r.getDouble(0).toLong
  r.getInt(1) != (k * n / N + 1).toInt
}
println(s"PARITY perplexityBuckets closed-form: ${bad.isEmpty} " +
  s"(${sample.length} sampled, ${bad.length} bad)")
sys.exit(0)
