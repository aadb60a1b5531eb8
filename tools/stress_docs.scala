// Run with: spark-shell --master 'local[8]' --driver-memory 6g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_docs.scala
// (default 1g driver heap OOMs on the 50k-doc window sorts; local mode
// shares the heap between driver and all executor threads)
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
// 10x events (1M rows): shift copies in time and id-space
val ev = graft.Tables.events(spark, d)
val evX = (0 until 10).map(i => ev.withColumn("event_id", col("event_id") + lit(i * 10000000L))
  .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS"))).reduce(_ union _)
evX.write.mode("overwrite").parquet("/tmp/stress/events.parquet")
// 10x documents (50k) and embeddings (20k)
val docs = spark.read.parquet(d + "/documents.parquet")
(0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress/documents.parquet")
val emb = spark.read.parquet(d + "/embeddings.parquet")
(0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress/embeddings.parquet")
val s = "/tmp/stress"
time("1M-window-sliding")(graft.SparkEntry.queries("q_window_sliding")(spark, s).count())
time("1M-window-session")(graft.SparkEntry.queries("q_window_session")(spark, s).count())
time("1M-interval-join")(graft.SparkEntry.queries("q_interval_join")(spark, s).count())
time("1M-keep-last3")(graft.SparkEntry.queries("q_keep_last3")(spark, s).count())
time("50k-minhash-lsh")(graft.SparkEntry.queries("q_minhash_lsh")(spark, s).count())
time("50k-word-count")(graft.SparkEntry.queries("q_word_count")(spark, s).count())
time("20k-lsh-pairs")(graft.SparkEntry.queries("q_lsh_pairs")(spark, s).count())
time("20k-nn-bruteforce")(graft.SparkEntry.queries("q_nn")(spark, s).count())
time("50k-clean-corpus")(graft.SparkEntry.queries("q_clean_corpus")(spark, s).count())
time("50k-dedup-keep")(graft.SparkEntry.queries("q_dedup_keep")(spark, s).count())
time("50k-pack-shards")(graft.SparkEntry.queries("q_pack_shards")(spark, s).count())
// span dedup at 10x: the x10 doc copies make every span of 9/10 docs a
// cross-document duplicate — the worst case for the ownership aggregation
time("50k-span-dedup")(graft.SparkEntry.queries("q_span_dedup")(spark, s).count())
time("20k-nn-lsh")(graft.SparkEntry.queries("q_nn_lsh")(spark, s).count())
// SNM skew stress: 1M synthetic docs, 30% sharing the head token "the" —
// the case where 1-token blocking collapses 300k docs into one partition.
// 2-token-prefix blocking must spread them (near-dup neighbors still share
// the full prefix, so recall within blocks is unaffected).
val skew = spark.range(1000000L).select(col("id").as("doc_id"),
  concat(
    when(col("id") % 10 < 3, lit("the")).otherwise(concat(lit("w"), pmod(col("id"), lit(5000)))),
    lit(" tok"), pmod(col("id"), lit(40000)),
    lit(" body x"), pmod(col("id"), lit(97)), lit(" y"), pmod(col("id"), lit(89))
  ).as("text"), lit("en").as("lang"))
skew.write.mode("overwrite").parquet("/tmp/stress/skewdocs.parquet")
val sd = spark.read.parquet("/tmp/stress/skewdocs.parquet")
time("1M-sorted-dedup-skew")(graft.ops.Dedup.sortedNeighborPairs(sd, threshold = 0.5).count())
// straggler check: rows per hashed blk_pfx shuffle target — max should sit
// near avg (1-token blocking would put ~300k rows in the "the" partition)
val blkPfx = expr("array_join(slice(filter(split(lower(text), '[^a-z0-9]+'), x -> x != ''), 1, 2), ' ')")
val skewStats = sd.select(pmod(hash(blkPfx), lit(32)).as("p")).groupBy("p").count()
  .agg(max("count").as("mx"), avg("count").as("av")).collect()(0)
println(s"SKEW blk_pfx partitions: max=${skewStats.getLong(0)} avg=${skewStats.getDouble(1)}")
time("50k-repetition")(graft.SparkEntry.queries("q_repetition")(spark, s).count())
time("50k-bpe-exact")(graft.SparkEntry.queries("q_bpe_exact")(spark, s).count())
time("50k-clean-corpus-v2")(graft.SparkEntry.queries("q_clean_corpus_v2")(spark, s).count())
time("50k-compression")(graft.SparkEntry.queries("q_compression")(spark, s).count())
// round-6/7 additions: retrieval, winnowing, pack-then-chunk, sessions
time("50k-search")(graft.SparkEntry.queries("q_search")(spark, s).count())
time("50k-bm25")(graft.SparkEntry.queries("q_bm25")(spark, s).count())
time("50k-bm25-idx-build+query")(graft.SparkEntry.queries("q_bm25_idx")(spark, s).count())
// second call = pure query serving: the postings + stats tables persist
time("50k-bm25-idx-query-only")(graft.SparkEntry.queries("q_bm25_idx")(spark, s).count())
time("50k-winnow")(graft.SparkEntry.queries("q_winnow")(spark, s).count())
// NOTE the ×10-copies corpus makes every doc a 10-way dup: q_winnow_pairs
// here measures true-pair OUTPUT volume (~C(10,2) per fp group), not
// selection overhead — the distinct-docs row below isolates the overhead
time("50k-winnow-pairs-dupheavy")(graft.SparkEntry.queries("q_winnow_pairs")(spark, s).count())
time("50k-winnow-stats")(graft.SparkEntry.queries("q_winnow_stats")(spark, s).count())
time("50k-pack-seq")(graft.SparkEntry.queries("q_pack_seq")(spark, s).count())
time("1M-chat-sessions")(graft.SparkEntry.queries("q_chat_sessions")(spark, s).count())
// overhead-bound winnowing over the 1M DISTINCT synthetic docs
time("1M-winnow-pairs-distinct")(graft.ops.Dedup.winnowPairs(sd).count())
time("1M-winnow-stats-distinct")(graft.ops.Dedup.winnowPairsStats(sd).count())
// round-7 late additions
time("50k-strip-html")(graft.SparkEntry.queries("q_strip_html")(spark, s).count())
time("50k-epoch-mix")(graft.SparkEntry.queries("q_epoch_mix")(spark, s).count())
time("50k-pack-bounds")(graft.SparkEntry.queries("q_pack_bounds")(spark, s).count())
time("50k-line-dedup")(graft.SparkEntry.queries("q_line_dedup")(spark, s).count())
// multi-line adversarial: ~40-token lines, ×10 copies make 90% of lines
// cross-document duplicates
val ml = spark.read.parquet(s + "/documents.parquet").select(col("doc_id"),
  regexp_replace(col("text"), "((\\S+\\s+){40})", "$1\n").as("text"))
time("50k-line-dedup-multiline")(graft.ops.Dedup.lineDedup(ml).count())
sys.exit(0)
