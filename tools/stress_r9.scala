// Round-9 stress rows: the two round-8 heavyweights (q_hash_embed,
// q_semdedup_text) at 10x bench SF — the NOTES.md convention every other
// operator family already has — plus the argmax block-size distribution
// behind the Σblock² claim, measured instead of asserted.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
// x10 copies with offset ids: every document gains 9 exact twins that hash
// to the SAME vector, hence the same argmax block — the worst-case
// intra-block pair volume for the semdedup self-join
(0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress9/documents.parquet")
val s = "/tmp/stress9"
println("docs: " + spark.read.parquet(s + "/documents.parquet").count())
time("50k-hash-embed")(graft.SparkEntry.queries("q_hash_embed")(spark, s).count())
time("50k-semdedup-text")(graft.SparkEntry.queries("q_semdedup_text")(spark, s).count())
// argmax block-size distribution at 50k docs: blocks, max block, Σblock²,
// and the max block's share of Σblock² (how concentrated the self-join is)
// — via the blockOccupancy telemetry operator (q_block_report)
println("BLOCKS:")
graft.ops.Similarity.blockOccupancy(graft.ops.Similarity.argmaxBlocked(
  graft.ops.TextAnalysis.hashEmbed(
    spark.read.parquet(s + "/documents.parquet"), dim = 64))).show(false)
// the incremental apply at 50k: base = first copy block (original ids),
// increment = one extra copy (5k docs, each an exact twin of a base doc)
// NOTE: keep each chain on ONE line — spark-shell -I evaluates a
// syntactically complete line immediately, so a trailing .where on the
// next line silently detaches (run b measured a 50k "increment" that way)
val base9 = spark.read.parquet(s + "/documents.parquet").where(col("doc_id") < 9000000L)
val inc9 = spark.read.parquet(s + "/documents.parquet").where(col("doc_id") >= 9000000L)
graft.ops.IndexTables.drop(spark, "graft_stress9_semtext_b16")
val idx9 = graft.ops.TextAnalysis.semanticDedupTextIndex(spark, base9, "graft_stress9_semtext")
time("5k-incr-apply-vs-45k-index")(
  graft.ops.TextAnalysis.semanticDedupTextApply(inc9, idx9).where(col("is_dup") === 1).count())
