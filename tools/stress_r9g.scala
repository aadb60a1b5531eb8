// Round-9g stress rows: hybrid retrieval (dense leg, RRF fusion, MMR
// re-rank) and covariance/PCA whitening — at 10x bench SF (50k docs /
// 50k embedding vectors, x10 copies).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9g.scala
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
import spark.implicits._
val qt = Seq((1L, "Stream JOIN"), (2L, "filter stream window"),
  (3L, "zzznosuchterm")).toDF("query_id", "query")

// dense leg: brute-force cosine over 50k hashed vectors, 3 queries
val dense = time("50k-dense-topk")(
  graft.ops.Retrieval.denseTopKAll(big, qt, k = 10).localCheckpoint())
println(dense.count() + " dense rows")

// lexical leg from a standing index + RRF fusion of both runs
graft.ops.IndexTables.drop(spark, "r9g_bm25_token_b8")
graft.ops.IndexTables.drop(spark, "r9g_bm25_stats")
val idx = time("50k-postings-index-build")(
  graft.ops.Retrieval.postingsIndex(big, "r9g_bm25"))
val stats = graft.ops.Retrieval.corpusStats(big, "r9g_bm25")
val lex = time("50k-bm25-topk-batch")(
  graft.ops.Retrieval.bm25TopKAll(idx, stats, qt, k = 10).localCheckpoint())
time("50k-rrf-fuse")(
  graft.ops.Retrieval.rrfFuse(Seq(lex, dense), topK = 10).count())

// MMR re-rank of the dense candidates (candidate-bounded: cost must be
// corpus-size-independent — the k² pair frame is 3 x 10² rows)
time("50k-mmr-m5")(
  graft.ops.Retrieval.mmrRerank(dense,
    graft.ops.TextAnalysis.hashEmbed(big, 64), m = 5).count())

// covariance + PCA whitening over 50k x10-copied embedding vectors
val emb = spark.read.parquet(d + "/embeddings.parquet")
val bigEmb = ((0 until 10).map(i =>
    emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
  .reduce(_ union _).localCheckpoint())
println("vecs: " + bigEmb.count())
time("50k-covariance")(
  graft.ops.Similarity.covarianceLong(bigEmb, 64).count())
val model = time("50k-pca-top8")(
  graft.ops.Similarity.pcaTop(bigEmb, dim = 64, k = 8))
println("eigvals head: " + model.eigvals.take(3).map(v => f"$v%.4f").toSeq)
time("50k-pca-whiten")(
  graft.ops.Similarity.pcaWhiten(bigEmb, model)
    .agg(sum(element_at(col("whitened"), 1))).collect().toSeq)

// incremental covariance: standing moments + 10%-increment merge
graft.ops.IndexTables.drop(spark, "r9g_moments")
val baseEmb = bigEmb.where(col("vec_id") % 10 < 9)
time("50k-moments-standing")(
  graft.ops.Similarity.momentsTable(spark, baseEmb, 64, "r9g_moments").count())
time("50k-cov-incremental")(
  graft.ops.Similarity.covarianceFromSums(
    graft.ops.Similarity.covarianceMerge(
      graft.ops.Similarity.momentsTable(spark, baseEmb, 64, "r9g_moments"),
      graft.ops.Similarity.momentSums(bigEmb.where(col("vec_id") % 10 === 9), 64))
      .localCheckpoint(), 64).count())

// store/serving diagnostics + text signals at 10x
time("50k-vec-quality")(
  graft.ops.Similarity.vectorQuality(bigEmb, 64)
    .where(col("flag")).count())
time("50k-run-overlap")(
  graft.ops.Retrieval.runOverlap(lex, dense).count())
time("50k-readability")(
  graft.ops.TextAnalysis.readability(big).agg(avg("flesch")).collect().toSeq)
time("50k-diversity")(
  graft.ops.TextAnalysis.ngramDiversity(big).count())
time("50k-pmi")(
  graft.ops.TextAnalysis.pmiCollocations(big).count())
time("50k-zipf")(
  graft.ops.TextAnalysis.zipfFit(big).collect().toSeq)
sys.exit(0)
