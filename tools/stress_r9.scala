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
val emb = graft.ops.TextAnalysis.hashEmbed(
  spark.read.parquet(s + "/documents.parquet"), dim = 64)
val blocks = emb
  .withColumn("_a", transform(col("embedding"), x => abs(x)))
  .select(array_position(col("_a"), array_max(col("_a"))).as("block"))
  .groupBy("block").count()
val st = blocks.agg(count(lit(1)).as("n_blocks"), max("count").as("max_block"),
  sum(col("count") * col("count")).as("sum_sq"),
  sum("count").as("n_vecs")).head
val nB = st.getLong(0); val mx = st.getLong(1); val ss = st.getLong(2); val nv = st.getLong(3)
println(f"BLOCKS n_blocks=$nB max_block=$mx sum_block_sq=$ss n_vecs=$nv " +
  f"nsq_ratio=${ss.toDouble / (nv.toDouble * nv)}%.5f " +
  f"max_share=${mx.toDouble * mx / ss}%.3f")
