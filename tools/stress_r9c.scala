// Round-9c stress rows: this session's operators at 10x bench SF
// (x10-copies corpus — worst case for the semantic family since every
// doc has 9 twins) plus a synthetic 1M-edge graph for PageRank.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9c.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
(0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress9c/documents.parquet")
val s = "/tmp/stress9c"
val big = spark.read.parquet(s + "/documents.parquet")
println("docs: " + big.count())

// semantic decontam: 50k-doc corpus vs the ~515-doc eval slice
time("50k-sem-decontam")(graft.ops.Decontam.semanticContamination(
  big.where(col("doc_id") % 97 =!= 0),
  big.where(col("doc_id") % 97 === 0 && col("doc_id") < 1000000L),
  minCos = 0.9).count())

// BPE merge learning: dictionary-sized iterations over the 50k corpus
time("50k-bpe-learn-20")(graft.ops.TextAnalysis.bpeLearn(big, nMerges = 20).count())

// image near-dup: 50k decodable PPMs, groups of 4
time("50k-image-near-dup")(graft.ops.Multimodal.imageNearDup(
  graft.ops.Multimodal.syntheticPpm(spark, 50000).select(col("media_id"), col("blob")),
  maxHamming = 3).count())

// JL projection: 50k synthetic 64-d vectors -> 16
val vecs = spark.range(50000L).toDF("vec_id").select(col("vec_id"),
  transform(sequence(lit(0), lit(63)),
    i => sin(col("vec_id") * 37 + i).cast("float")).as("embedding"))
time("50k-rand-proj")(graft.ops.Similarity.randomProject(vecs, 64, 16).count())

// PageRank at two scales: the sf0.1 event graph (100 nodes), then a
// synthetic 1M-edge / 100k-node power-law-ish graph
val ev = graft.Tables.events(spark, d).select(col("user_id"), col("ts"),
  col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("page"))
time("sf01-pagerank-3it")(graft.ops.Graph.pageRank(
  graft.ops.Graph.transitionEdges(ev, "page", "user_id", "ts", "event_id"), 3).count())
val edges1m = spark.range(1000000L).toDF("i").select(
  pmod(hash(col("i")), lit(100000)).cast("long").as("src"),
  pmod(hash(col("i") * 31 + 7), lit(1000)).cast("long").as("dst"),
  lit(1L).as("weight"))
time("1M-edge-pagerank-3it")(graft.ops.Graph.pageRank(edges1m, 3).count())

// v8 recipe end to end at 50k (substring scrub + v6 chain + sem stage);
// scrub materialized once — the recipe scans its input per stage
val scrubbed = graft.ops.Dedup.substringScrub(big, k = 8)
  .select(col("doc_id"), col("text"))
  .localCheckpoint()
time("50k-clean-corpus-v8")(graft.ops.Curation.cleanCorpusV8Stats(
  scrubbed.where(col("doc_id") % 97 =!= 0),
  big.where(col("doc_id") % 97 === 0 && col("doc_id") < 1000000L),
  contamN = 3, pplRates = Seq(1.0, 1.0, 1.0, 0.5, 0.1),
  semMinCos = 0.85).collect().toList)
