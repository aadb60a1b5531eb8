// Stress rows for the round-8 operators at 10x bench SF.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r8.scala
// (writes output to the console; redirect to a file — progress bars embed \r)
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
(0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress/documents.parquet")
val emb = spark.read.parquet(d + "/embeddings.parquet")
(0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress/embeddings.parquet")
val s = "/tmp/stress"
// span-level decontamination scrub: 500k train docs vs ~5k eval docs
time("500k-decontam-scrub")(graft.SparkEntry.queries("q_decontam_scrub")(spark, s).count())
// sign-blocked semantic dedup over 20k vectors (x10 copies: every vector a
// 10-way exact dup — worst-case intra-block pair volume)
time("20k-semdedup")(graft.SparkEntry.queries("q_semdedup")(spark, s).count())
// EOS-sentinel pack-then-chunk at the serial parts=1 oracle-twin config
time("500k-pack-eos")(graft.SparkEntry.queries("q_pack_eos")(spark, s).count())
// v6 full recipe (8 stages incl. fractional perplexity thinning)
time("500k-v6-recipe")(graft.SparkEntry.queries("q_clean_corpus_v6")(spark, s).count())
// SFT loss-mask spans over 1M events (events replicated like the docs —
// ids offset so (ts, event_id) stays unique per user)
val ev = graft.Tables.events(spark, d)
(0 until 10).map(i => ev
    .withColumn("event_id", col("event_id") + lit(i * 10000000L))
    .withColumn("user_id", col("user_id") + lit(i * 1000L)))
  .reduce(_ union _)
  .createOrReplaceTempView("stress_events")
time("1M-loss-mask")(graft.ops.Conversations.lossMaskSpans(
  spark.table("stress_events"), Seq("click", "purchase")).count())
// FIM transform over 500k docs (scan-stage only)
time("500k-fim")(graft.SparkEntry.queries("q_fim")(spark, s).count())
// interleaved image-text assembly over 500k docs
time("500k-interleave")(graft.SparkEntry.queries("q_interleave")(spark, s).count())
// per-row streaming scrub twin (batch run of the stateless form)
time("500k-scrub-with-grams") {
  val evalGrams = graft.ops.Decontam.collectEvalGrams(
    docs.where(col("doc_id") % 97 === 0), "text", 3)
  graft.ops.Decontam.scrubWithGrams(
    spark.read.parquet(s + "/documents.parquet").where(col("doc_id") % 97 =!= 0),
    evalGrams, 3).count()
}
sys.exit(0)
