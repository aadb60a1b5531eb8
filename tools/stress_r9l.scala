// Round-9l stress row: the ingest gate at 10x bench SF — 40k-doc
// snapshot artifacts (line-freq index + cleaned-text fingerprints),
// 10k-doc increment judged end to end.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9l.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(d + "/documents.parquet")
// salt each copy's body INLINE: the raw x10-copies corpus makes every
// body line 10-way shared, so LINE-level boilerplate removal correctly
// scrubs everything to '' and every doc "dups" md5('') — observed, and
// exactly what the gate should do to such a corpus, but useless as a
// stress fixture. Unique bodies + an explicit cross-split copy class
// (doc_id-8 self-join, the q_ingest_gate idiom) restore one verdict
// mix per class.
val big0 = ((0 until 10).map(i =>
    docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
      concat(col("text"), lit(" v" + i)).as("text")))
  .reduce(_ union _)
  // the q_ingest_gate injection classes, at scale
  .select(col("doc_id"), concat(col("text"),
    when(col("doc_id") % 10 >= 8 && col("doc_id") % 4 === 1,
      lit(" ingest gate sentinel check")).otherwise(lit("")),
    when(col("doc_id") % 10 >= 8 && col("doc_id") % 4 === 2,
      lit(" mail bob@example.com")).otherwise(lit("")),
    when(col("doc_id") % 10 >= 8 &&
        (col("doc_id") % 4 === 2 || col("doc_id") % 4 === 3),
      lit(" with the rest of that batch and more to have it all be done"))
      .otherwise(lit("")),
    when(col("doc_id") % 3 === 0,
      lit("\nsubscribe to our newsletter")).otherwise(lit("")))
    .as("text"))
  .localCheckpoint())
// whole chain inside ONE paren group: `val big = big0.join(...)` is a
// complete REPL statement, so an unparenthesized trailing `.select` line
// becomes a separate result and big stays the bare join — the override
// silently never fires (n_dup = 0, observed). THIRD hit of the REPL
// continuation trap (stress_r9d, stress_r9i, here).
val srcCopy = big0.select((col("doc_id") + 8L).as("doc_id"),
  col("text").as("_st"))
val big = (big0.join(srcCopy, Seq("doc_id"), "left")
  .select(col("doc_id"),
    when(col("doc_id") % 10 >= 8 && col("doc_id") % 4 === 0 &&
      col("_st").isNotNull, col("_st")).otherwise(col("text")).as("text"))
  .localCheckpoint())
val base = big.where(col("doc_id") % 10 < 8).localCheckpoint()
val inc = big.where(col("doc_id") % 10 >= 8).localCheckpoint()
println("base: " + base.count() + " inc: " + inc.count())

graft.ops.IndexTables.drop(spark, "stress9l_linefreq_b8")
val idx = time("40k-linefreq-index-build")(
  graft.ops.Dedup.lineFreqIndex(base, "stress9l"))
val fps = time("40k-fingerprint-set-build")(
  graft.ops.Scrub.scrubPii(graft.ops.Dedup.boilerplateScrub(base, 3))
    .select(md5(col("text")).as("fp")).distinct().localCheckpoint())
val grams = graft.ops.Decontam.collectEvalGrams(
  Seq((0L, "ingest gate sentinel check passage")).toDF("doc_id", "text"),
  "text", 3)
val verdicts = time("10k-ingest-gate")(
  graft.ops.Curation.ingestGateExact(inc, idx, grams, fps)
    .groupBy("keep").count().collect().toList.sortBy(_.getInt(0)))
time("10k-ingest-report")(
  graft.ops.Curation.ingestSummary(
    graft.ops.Curation.ingestGateExact(inc, idx, grams, fps))
    .collect().toList)
sys.exit(0)
