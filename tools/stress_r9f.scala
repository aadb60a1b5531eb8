// Round-9f stress rows: phrase search (direct/index/batch), typo
// clustering + normalization, cluster split, sketch surprisal, span
// corruption — at 10x bench SF (50k docs, x10 exact copies).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9f.scala
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

// phrase search straight off the corpus (scan-stage position filter)
time("50k-phrase-direct")(
  graft.ops.Retrieval.phraseSearch(big, "batch batch").count())

// standing positional index: build once, serve single + 10-phrase batch
graft.ops.IndexTables.drop(spark, "r9f_pos_pos_b8")
val pidx = time("50k-positional-index-build")(
  graft.ops.Retrieval.positionalIndex(big, "r9f_pos"))
time("50k-phrase-from-index")(
  graft.ops.Retrieval.phraseFromIndex(pidx, "stream spark").count())
val phrases = (Seq("batch batch", "stream spark", "join order",
    "window window", "the fast", "slow merge", "hash scan", "data row",
    "spark table", "filter filter").zipWithIndex
  .map { case (p, i) => (i.toLong, p) }.toDF("phrase_id", "phrase"))
time("50k-phrase-batch-10")(
  graft.ops.Retrieval.phraseSearchAll(pidx, phrases).count())

// typo clustering + apply over the 10x token volume (31-word vocab +
// injected 1-edit variants on every 11th doc)
val injected = big.select(col("doc_id"),
  when(col("doc_id") % 11 === 0,
    concat(col("text"), lit(" batc batchh batxh abtch")))
    .otherwise(col("text")).as("text"))
val mapping = time("50k-typo-clusters")(
  graft.ops.TextAnalysis.typoClusters(injected).localCheckpoint())
println(mapping.where(col("word") =!= col("canonical")).count() + " remaps")
time("50k-typo-normalize")(
  graft.ops.TextAnalysis.typoNormalize(injected, mapping)
    .agg(sum("n_changed")).collect().toSeq)

// cluster-respecting split: the x10 corpus is 10-way dup clusters by
// construction — every copy family must co-locate
val fps = graft.ops.TextAnalysis.fingerprints(big)
val clusters = (fps.groupBy("fp")
  .agg(min("doc_id").as("cluster_id"), count(lit(1)).as("_n"))
  .where(col("_n") > 1))
val assign = fps.join(clusters, "fp").select("doc_id", "cluster_id")
val splitDf = time("50k-cluster-split")(
  graft.ops.Sampling.clusterSplit(fps.select("doc_id"), assign, 0.8, 0.1)
    .localCheckpoint())
println("straddling clusters (must be 0): " + (splitDf
  .where(col("cluster_id").isNotNull)
  .groupBy("cluster_id").agg(countDistinct("split").as("ns"))
  .where(col("ns") > 1).count()))

// sketch-backed surprisal at 10x token volume
time("50k-surprisal-cms")(
  graft.ops.TextAnalysis.surprisalScoresSketch(big, depth = 4, width = 64)
    .count())

// span corruption: scan-stage only
time("50k-span-corrupt")(
  graft.ops.Packing.spanCorrupt(big, spanEvery = 16, spanLen = 3)
    .agg(sum("n_spans")).collect().toSeq)
System.exit(0)
