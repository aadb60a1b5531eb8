// Round-14 stress C — the second scale wave: ops whose 100 TB path had
// not yet run at real volume. 500k near-dup docs (the stress_r14b
// corpus) for the token-volume ops; 200k vectors (10× sf0.1
// embeddings) for the ANN stack; 6M events (10×) for SCD2.
//   - substringScrub at 500k: the Lee-et-al exact dedup's worst case —
//     every 8-gram owned 100× over; occurrence-RANKED (no pair join),
//     so cost must stay one token-volume shuffle;
//   - decontaminate at 500k vs a 5k eval set (gram join);
//   - scd2 full build at 6M change rows + scd2Apply of a 600k batch
//     against the standing history;
//   - urlFrontierIndex probe at 500k URLs;
//   - IVF index build + batch top-k + PQ top-k at 200k vectors
//     (trainers stay bounded-sample by contract — the corpus grows,
//     the model does not);
//   - packByTokenBudget (parts=1 sorted pack) at 500k.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 48g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//   --conf spark.sql.warehouse.dir=/tmp/stress100c_wh \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r14c.scala
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Decontam, Dedup, History, Packing, Similarity, WebCuration}

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

time("substring_scrub 500k (8-grams owned 100x over)") {
  val s = Dedup.substringScrub(docs, k = 8)
  println(s"[stress]   rows=${s.count()} " +
    s"kept_tokens=${s.agg(sum("n_kept")).head.getLong(0)}")
}
time("decontaminate 500k vs 5k eval grams") {
  println(s"[stress]   survivors=${Decontam.decontaminate(
    docs.where(col("doc_id") % 97 =!= 0).select("doc_id", "text"),
    docs.where(col("doc_id") % 97 === 0).select("doc_id", "text"),
    "doc_id", "text").count()}")
}
time("pack_by_token_budget 500k (parts=1 carry)") {
  println(s"[stress]   shards=${Packing.packByTokenBudget(docs,
    budget = 4096, parts = 1)
    .agg(countDistinct("shard_id")).head.getLong(0)}")
}
time("url_frontier 500k") {
  val urls = docs.select(col("doc_id"), concat(lit("https://"),
    col("source"), lit(".org/p/"), col("doc_id")).as("url"))
  val idx = WebCuration.urlFrontierIndex(
    urls.where(col("doc_id") % 10 < 8), "url").localCheckpoint()
  println(s"[stress]   frontier=${idx.count()}")
}

// ---- SCD2 at 6M change rows + 600k increment -----------------------
// replicas are spaced 370 days apart (the raw events span well under a
// year), so replica 9 is strictly time-disjoint from 0-8: the base/
// increment split honors scd2Apply's append-only validate contract by
// construction, no timestamp arithmetic needed (TIMESTAMP_NTZ refuses
// double casts)
val changes = {
  val ev = Tables.events(spark, "/root/testdata/sf0.1")
    .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
  (0 until 10).map(i => ev
    .withColumn("event_id", col("event_id") + lit(i * 100000000L))
    .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 370} DAYS")))
    .reduce(_ unionAll _).repartition(64).localCheckpoint()
}
println(s"[stress] changes: ${changes.count()} rows")
val base = changes.where(col("event_id") < 9L * 100000000L)
val inc = changes.where(col("event_id") >= 9L * 100000000L)
val hist = time("scd2 full build (base split)") {
  val h = History.scd2(base, "user_id", "ts", "event_id", "event_type")
    .localCheckpoint()
  println(s"[stress]   history_rows=${h.count()}")
  h
}
time("scd2_apply increment against standing history") {
  println(s"[stress]   rows=${History.scd2Apply(hist, inc,
    "user_id", "ts", "event_id", "event_type").count()}")
}

// ---- ANN at 200k vectors (sf0.1 embeddings = 2k rows, so 100×) ------
val emb = {
  val e0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
  (0 until 100).map(i =>
    e0.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
    .reduce(_ unionAll _).repartition(64).localCheckpoint()
}
println(s"[stress] vectors: ${emb.count()}")
val (cents, assigned0) = time("ivf index build 200k (bounded-sample train)") {
  Similarity.ivfIndex(emb, k = 16, name = "stress200k_ivf")
}
val assigned = assigned0.localCheckpoint()
time("ivf batch topk: 1k queries x 200k corpus, nprobe=4") {
  println(s"[stress]   rows=${Similarity.ivfTopKAll(assigned,
    emb.where(col("vec_id") % 200 === 0), 10, cents).count()}")
}
System.exit(0)
