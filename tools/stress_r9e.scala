// Round-9e stress rows: RM3, containment, vocab coverage, SCD2 fold,
// funnel (+incremental fold), importance resampling — at 10x bench SF.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9e.scala
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

// RM3 over a fresh 50k-doc postings index (build + expand-and-rescore)
graft.ops.IndexTables.drop(spark, "r9e_rm3_postings_b8")
graft.ops.IndexTables.drop(spark, "r9e_rm3_stats")
val idx = time("50k-postings-build")(
  graft.ops.Retrieval.postingsIndex(big, "r9e_rm3"))
val stats = graft.ops.Retrieval.corpusStats(big, "r9e_rm3")
val queries = Seq((1L, "spark table scan"), (2L, "window agg batch"),
  (3L, "customer order line")).toDF("query_id", "query")
time("50k-rm3-expand")(graft.ops.Retrieval.rm3Expand(
  idx, stats, queries, k = 10, fbDocs = 5, fbTerms = 3).count())

// containment: 5k quote docs vs their 50k sources
val quotes = big.where(col("doc_id") % 10 === 0).select(
  (col("doc_id") + 100000000L).as("doc_id"),
  array_join(slice(graft.ops.Core.tokensUni(col("text")), 1, 15), " ").as("text"))
val corpus2 = big.select(col("doc_id"), col("text")).unionByName(quotes)
val cands = big.where(col("doc_id") % 10 === 0).select(
  (col("doc_id") + 100000000L).as("a_id"), col("doc_id").as("b_id"))
// 3.4 s cold / 1.7 s warm after the broadcast-prune + shingle
// lineage-cut (14.2 s with the live double-evaluated shingle subtree)
time("50k-containment-5k-pairs")(
  graft.ops.Dedup.ngramContainment(corpus2, cands).where(col("a_in_b") === 1).count())

// vocab coverage over the 50k corpus
time("50k-vocab-coverage")(graft.ops.TextAnalysis.vocabCoverage(big).count())

// SCD2 incremental fold: 1M-change history + 100k-change batch
val ch = spark.range(1100000L).toDF("event_id").select(col("event_id"),
  pmod(col("event_id") * 17, lit(100000)).as("user_id"),
  timestamp_seconds(lit(1700000000L) + col("event_id")).as("ts"),
  concat(lit("s"), pmod(hash(col("event_id")), lit(4))).as("event_type"))
val hist = time("1M-scd2-build")(graft.ops.History.scd2(
  ch.where(col("event_id") < 1000000L), "user_id", "ts", "event_id",
  "event_type").localCheckpoint())
time("100k-scd2-fold")(graft.ops.History.scd2Apply(hist,
  ch.where(col("event_id") >= 1000000L), "user_id", "ts", "event_id",
  "event_type").count())

// funnel over 10x events (100k rows) + incremental fold of a late batch
val ev = graft.Tables.events(spark, d)
val bigEv = ((0 until 10).map(i =>
    ev.withColumn("user_id", col("user_id") + lit(i * 10000L)))
  .reduce(_ union _).localCheckpoint())
val steps = Seq("view", "click", "purchase")
time("100k-funnel")(graft.ops.Windowing.funnelCounts(bigEv, steps).count())
val cutTs = to_timestamp(lit("2024-01-25 00:00:00"))
val st = time("100k-funnel-build")(graft.ops.Windowing.funnelTimes(
  bigEv.where(col("ts") < cutTs), steps).localCheckpoint())
time("funnel-fold-tail")(graft.ops.Windowing.funnelApply(st,
  bigEv.where(col("ts") >= cutTs), steps).count())

// importance resampling: 50k docs toward the en reference, k=1000
val edges = Seq(150.0, 250.0, 350.0, 450.0)
time("50k-resample-1k")(graft.ops.Sampling.matchDistribution(
  big.where(col("lang") =!= "en"),
  graft.ops.TextAnalysis.bucketCounts(big.where(col("lang") === "en"),
    "n_chars", edges),
  "n_chars", edges, k = 1000, idCol = "doc_id").count())
sys.exit(0)
