// Round-14 stress B: 100× sf0.1 documents (500k near-dup docs) through
// the core curation/dedup/retrieval chains — the 100 TB-path shapes:
//   - SNM pairs feeding the DISTRIBUTED label-propagation path of
//     nearDupClusters (edge count above the 2^18 driver fast-path fence
//     for the first time in any stress run);
//   - winnowing multi-k under heavy fingerprint sharing (every doc has
//     99 near-identical replicas — the hot-fp posting caps earn their
//     keep);
//   - the full v5 recipe (gate → exact dedup → SNM → decontam →
//     surprisal quantiles → span dedup) end to end;
//   - a standing BM25 postings build + query serve;
//   - semdedup blockOccupancy telemetry at 500k (the decide-before-
//     you-pay report) with the flags decision itself at 10× (50k) —
//     100 identical-text replicas per doc is the documented O(block²)
//     worst case the occupancy report exists to catch.
// Replicas get a per-replica " rep<i>" SUFFIX so they are NEAR
// duplicates (exact dedup keeps them; SNM/winnow/semdedup must do real
// work), not exact copies.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 48g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//   --conf spark.sql.warehouse.dir=/tmp/stress100_wh \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r14b.scala
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Retrieval, Similarity, TextAnalysis}

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
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

val pairs = time("snm_pairs 500k docs") {
  val p = Dedup.sortedNeighborPairs(docs, threshold = 0.9).localCheckpoint()
  println(s"[stress]   pairs=${p.count()}")
  p
}
time("clusters 500k (DISTRIBUTED label propagation)") {
  val c = Dedup.nearDupClusters(pairs)
  println(s"[stress]   clusters=${c.select(countDistinct("cluster_id")).head.getLong(0)} " +
    s"members=${c.count()}")
}
time("dedup_corpus 500k") {
  println(s"[stress]   survivors=${Dedup.dedupCorpus(docs, pairs).count()}")
}
time("winnow_multik 500k (hot-fp caps live)") {
  println(s"[stress]   pairs=${Dedup.winnowPairsMultiK(docs).count()}")
}
time("recipe_v5 500k end-to-end") {
  Curation.cleanCorpusV5Stats(
    docs.where(col("doc_id") % 97 =!= 0),
    docs.where(col("doc_id") % 97 === 0).select("doc_id", "text"))
    .orderBy("stage").collect()
    .foreach(r => println(s"[stress]   ${r.getString(0)}=${r.getLong(1)}"))
}
time("bm25 postings build 500k") {
  Retrieval.postingsIndex(docs, "stress100")
  Retrieval.corpusStats(docs, "stress100")
  ()
}
time("bm25 topk serve (standing index — second call is the cache hit)") {
  val idx = Retrieval.postingsIndex(docs, "stress100")
  val st = Retrieval.corpusStats(docs, "stress100")
  Retrieval.bm25TopK(idx, st, Seq("data", "spark", "stream"), k = 10)
    .collect().take(2).foreach(r => println(s"[stress]   $r"))
}
time("semdedup blockOccupancy 500k (telemetry before the O(block^2) pay)") {
  Similarity.blockOccupancy(
    Similarity.argmaxBlocked(TextAnalysis.hashEmbed(docs, dim = 64)))
    .orderBy(desc("n_vecs")).collect().take(3)
    .foreach(r => println(s"[stress]   $r"))
}
time("semdedup flags 50k (10x)") {
  val d10 = docs.where(col("doc_id") < 100000000L) // replicas 0-9 = 50k
  println(s"[stress]   flags=${Similarity.semanticDedupFlagsArgmax(
    TextAnalysis.hashEmbed(d10, dim = 64), minCos = 0.9)
    .where(col("is_dup") === 1).count()}")
}
System.exit(0)
