// Round-15 stress B — the new round-15 operators at 100× scale (the
// r14 stress discipline: output columns hashed, never bare counts):
//   1. semanticDedupFlagsBoundedApply: 500k-doc collapsed-shape standing
//      index (43% of the corpus in one argmax block) probed by a 50k
//      increment — the daily-ingest cost must be increment-shaped, not
//      corpus-shaped, on the adversarial blocking;
//   2. ndcgAtK: standing BM25 postings over 500k docs, 1k graded
//      queries;
//   3. bleuScoreMulti: 500k (ref, ref2, cand) triples through the
//      max-merge clip — one-row corpus result;
//   4. permTestPaired: 500k paired metrics × 200 sign-flip replicas
//      (100M exploded rows through one groupBy);
//   5. qaDict + qaDictMerge at 500k pairs; lengthBiasCurve at 500k games.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 48g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//   --conf spark.sql.warehouse.dir=/tmp/stress_r15b_wh \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r15b.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.ops.{Preference, Retrieval, Similarity, TextAnalysis}

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}
def exercise(df: DataFrame, label: String): Unit = {
  val h = (df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
    .agg(expr("bit_xor(h)")).head.getLong(0))
  println(s"[stress]   $label hash=$h")
}

val docs = {
  val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .select("doc_id", "text")
  (0 until 100).map(i => d0
    .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    .withColumn("text", concat(col("text"), lit(" rep" + i)))
  ).reduce(_ unionAll _).repartition(64).localCheckpoint()
}
println(s"[stress] corpus: ${docs.count()} docs")

// 1. bounded APPLY on the collapsed standing index, 50k increment
val snap = time("boundedBlocked standing index 500k (collapsed shape)") {
  (Similarity.boundedBlocked(
    TextAnalysis.hashEmbed(docs, dim = 64), maxBlock = 1024, levels = 2)
    .localCheckpoint())
}
val incDocs = {
  val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .select("doc_id", "text")
  (100 until 110).map(i => d0
    .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    .withColumn("text", concat(col("text"), lit(" rep" + i)))
  ).reduce(_ unionAll _).repartition(16).localCheckpoint()
}
time("bounded APPLY: 50k increment vs 500k collapsed index") {
  exercise(Similarity.semanticDedupFlagsBoundedApply(snap,
    TextAnalysis.hashEmbed(incDocs, dim = 64),
    minCos = 0.9, maxBlock = 1024, levels = 2), "bounded_apply_50k")
}

// 2. ndcg over a standing postings index, 1k graded queries
time("bm25 postings build 500k") {
  Retrieval.postingsIndex(docs, "stress15b")
  Retrieval.corpusStats(docs, "stress15b")
  ()
}
// MEASURED (r15 close): uncapped 982.57 s — 1k five-token-prefix queries
// carry corpus-common tokens, and on a 100x-replica corpus each such
// token contributes a df-sized candidate set (the known-item batch-eval
// scale wall). With maxDf = 5000 (the opt-in stopword prune added this
// round): 6.87 s — 143x — with the IDENTICAL output hash
// (-4688538328671334794): the pruned terms carried no discriminating
// signal, so no ndcg decision moved on this corpus.
time("ndcgAtK: 1k graded queries vs 500k index (maxDf=5000)") {
  val idx = Retrieval.postingsIndex(docs, "stress15b")
  val st = Retrieval.corpusStats(docs, "stress15b")
  val qd = docs.where(col("doc_id") % 500 === 0)
  val qrels = qd.select(col("doc_id").as("query_id"))
    .select(col("query_id"), explode(array(
      struct(col("query_id").as("doc_id"), lit(3).as("rel")),
      struct((col("query_id") + 1).as("doc_id"), lit(2).as("rel")),
      struct((col("query_id") + 2).as("doc_id"), lit(1).as("rel"))))
      .as("qr"))
    .select(col("query_id"), col("qr.doc_id").as("doc_id"), col("qr.rel").as("rel"))
    .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
  exercise(Retrieval.ndcgAtK(idx, st, qd, qrels, k = 10, queryTokens = 5,
    maxDf = Some(5000L)), "ndcg_1k")
}

// 3. multi-reference BLEU over 500k triples
time("bleuScoreMulti 500k pairs") {
  val t = graft.ops.Core.tokensUni(col("text"))
  val pairs = docs.select(col("doc_id"),
    array_join(t, " ").as("ref"),
    array_join(transform(t, (x, i) =>
      when((i + 1) % 3 === 0, lit("xx")).otherwise(x)), " ").as("ref2"),
    array_join(filter(transform(t, (x, i) =>
      when((i + 1) % 3 === 0, lit("xx")).otherwise(x)),
      (_, i) => (i + 1) % 5 =!= 0), " ").as("cand"))
  exercise(TextAnalysis.bleuScoreMulti(pairs, "doc_id", Seq("ref", "ref2"),
    "cand"), "bleu_multi_500k")
}

// 4. permutation test: 500k items x 200 replicas
time("permTestPaired 500k x 200 replicas (100M sign-flip rows)") {
  val scored = docs.select(col("doc_id"),
    (pmod(col("doc_id") * 7919, lit(1000)) / 1000.0).as("m_a"),
    (pmod(col("doc_id") * 104729, lit(1000)) / 1000.0).as("m_b"))
  exercise(TextAnalysis.permTestPaired(scored, "doc_id", "m_a", "m_b",
    replicas = 200), "perm_500k")
}

// 5. qaDict at 500k + merge; lengthBiasCurve at 500k games
time("qaDict 500k + merge") {
  val t = graft.ops.Core.tokensUni(col("text"))
  val pairs = docs.select(col("doc_id"),
    array_join(t, " ").as("gold"),
    array_join(filter(t, (_, i) => (i + 1) % 3 =!= 0), " ").as("pred"))
  val dict = TextAnalysis.qaDict(pairs.where(col("doc_id") % 2 === 0),
    "doc_id", "gold", "pred")
  exercise(TextAnalysis.qaEvalFromDict(
    TextAnalysis.qaDictMerge(dict, pairs.where(col("doc_id") % 2 =!= 0),
      "doc_id", "gold", "pred")), "qa_dict_500k")
}
time("lengthBiasCurve 500k games") {
  val judged = docs.select(
    (lit(100) + (col("doc_id") * 7) % 120).as("win_len"),
    (lit(100) + (col("doc_id") * 13) % 120).as("lose_len"))
  exercise(Preference.lengthBiasCurve(judged), "len_curve_500k")
}
sys.exit(0)
