// Stress rows for the late-round-7 operators at 10x bench SF.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r7b.scala
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
// retrieval serving: index build + 3-query batch in one bucket-pruned pass
time("500k-bm25-batch")(graft.SparkEntry.queries("q_bm25_batch")(spark, s).count())
// two winnow resolutions on the x10-copies corpus (every doc a 10-way dup —
// pair-output volume is the cost, like the q_winnow_pairs stress row)
time("500k-winnow-multik")(graft.SparkEntry.queries("q_winnow_multik")(spark, s).count())
time("500k-ppl-mix")(graft.SparkEntry.queries("q_ppl_mix")(spark, s).count())
time("500k-line-stats")(graft.SparkEntry.queries("q_line_stats")(spark, s).count())
time("500k-token-hist")(graft.SparkEntry.queries("q_token_hist")(spark, s).count())
time("500k-shard-manifest")(graft.SparkEntry.queries("q_shard_manifest")(spark, s).count())
// 200k-vector IVF build + 100-anchor mining (cold index, build included)
time("200k-hard-negatives")(graft.SparkEntry.queries("q_hard_negatives")(spark, s).count())
// warm index now: triplets re-probe the standing assignment
time("200k-triplets")(graft.SparkEntry.queries("q_triplets")(spark, s).count())
// MP4 header walk over 300k synthetic blobs (100k carry the ftyp/moov tree)
time("300k-media-mp4")(graft.ops.Multimodal.mediaFeatures(
  graft.ops.Multimodal.syntheticMedia(spark, 300000)).count())
sys.exit(0)
