// Round-9k stress rows: unigram-LM tokenizer (learn / encode / doc
// stats) and the bin-expansion range lookup — at 10x bench SF.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9k.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
val big = ((0 until 10).map(i =>
    docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).localCheckpoint())
println("docs: " + big.count())

// unigram training: distinct-word dictionary is UNCHANGED by the x10
// copies (Heaps'-law point: corpus x10, dictionary x1), so also time a
// genuinely-wider dictionary via doc_id-salted words
val learned = time("50k-unigram-learn-v256-em2")(
  graft.ops.TextAnalysis.unigramLearn(big, vocabSize = 256, emIters = 2))
val model = graft.ops.TextAnalysis.unigramModelOf(learned)
println("model size: " + model.size)
val salted = big.select(col("doc_id"),
  concat(col("text"), lit(" w"), (col("doc_id") % 5000).cast("string"))
    .as("text"))
time("50k-unigram-learn-salted-dict")(
  graft.ops.TextAnalysis.unigramLearn(salted, vocabSize = 256,
    emIters = 2).count())

time("50k-unigram-encode")(
  graft.ops.TextAnalysis.unigramEncodeLearned(big, model).count())
time("50k-unigram-doc-stats")(
  graft.ops.TextAnalysis.unigramDocStats(big, model).count())
// full EM (forward-backward expected counts) and the sampled encode
time("50k-unigram-learn-soft-v256-em2")(
  graft.ops.TextAnalysis.unigramLearnSoft(big, vocabSize = 256,
    emIters = 2).count())
time("50k-unigram-sample-encode")(
  graft.ops.TextAnalysis.unigramSampleEncode(big, model, seed = 17L).count())

// range lookup: 650k lineitem x10 = 6.5M facts against 4 bands (bin
// expansion + hash join); the naive theta form is a BNLJ — not timed,
// it IS the thing being avoided
val li = spark.read.parquet(d + "/lineitem.parquet")
val facts = ((0 until 10).map(_ => li.select(col("l_extendedprice").as("price")))
  .reduce(_ union _)).localCheckpoint()
println("facts: " + facts.count())
val bands = Seq((1, 0.0, 20000.0), (2, 15000.0, 40000.0),
  (3, 40000.0, 70000.0), (4, 70000.0, 200000.0)).toDF("band_id", "lo", "hi")
time("6.5M-range-lookup")(
  graft.ops.Joins.rangeLookup(facts, bands, "price", "lo", "hi", 8000.0)
    .groupBy("band_id").count().collect().toList.sortBy(_.getInt(0)))
sys.exit(0)
