// Round-14 stress D — the text-analysis scan family at 500k near-dup
// docs (~50M tokens). These are the per-document kernels a 100 TB
// curation pass runs on EVERY row, so they must stay zero-shuffle
// linear scans; the one op with real scale risk is lmPerplexity, whose
// bigram model is vocab²-bounded (a standing TABLE, not a driver
// collect) and whose scorer joins the corpus's bigram stream against
// it — one token-volume shuffle.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 48g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r14d.scala
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}
def exercise(df: org.apache.spark.sql.DataFrame): Unit = {
  df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
    .agg(expr("bit_xor(h)")).collect()
  ()
}

val docs = {
  val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .select("doc_id", "text", "lang", "source", "n_chars")
  (0 until 100).map(i => d0
    .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    .withColumn("text", concat(col("text"), lit(" rep" + i)))
  ).reduce(_ unionAll _).repartition(64).localCheckpoint()
}
println(s"[stress] corpus: ${docs.count()} docs")

time("token_stats 500k") { exercise(TextAnalysis.tokenStats(docs)) }
time("quality_scores 500k") { exercise(TextAnalysis.qualityScores(docs)) }
time("repetition 500k") { exercise(TextAnalysis.repetitionScores(docs)) }
time("lang_id 500k") { exercise(TextAnalysis.langId(docs)) }
time("gopher_gate 500k") { exercise(TextAnalysis.gopherGate(docs)) }
time("tfidf top-3 500k") { exercise(TextAnalysis.tfIdfTopTerms(docs, 3)) }
val model = time("lm_counts model fit (train split)") {
  val m = TextAnalysis.lmCounts(docs.where(col("doc_id") % 97 =!= 0))
    .localCheckpoint()
  println(s"[stress]   bigram_rows=${m.count()}")
  m
}
time("lm_perplexity 500k scored against standing model") {
  exercise(TextAnalysis.lmPerplexity(docs, model))
}
System.exit(0)
