// Round-9b stress rows: the new operators at 10x bench SF (x10-copies
// corpus from stress_r9.scala — every doc has 9 exact twins, the
// worst case for substring ownership since every gram is 10-way
// duplicated).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9b.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
(0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress9b/documents.parquet")
val s = "/tmp/stress9b"
println("docs: " + spark.read.parquet(s + "/documents.parquet").count())
time("50k-substring-scrub")(graft.SparkEntry.queries("q_substring_scrub")(spark, s).count())
time("50k-token-ids")(graft.SparkEntry.queries("q_token_ids")(spark, s).count())
time("50k-bpe-encode")(graft.SparkEntry.queries("q_bpe_encode")(spark, s).count())
time("50k-dedup-merge-skew-free")(graft.ops.Dedup.canonicalPerCluster(
  spark.read.parquet(s + "/documents.parquet"),
  spark.emptyDataFrame.withColumn("doc_id", lit(0L)).withColumn("cluster_id", lit(0L))
    .select(col("doc_id"), col("cluster_id")).limit(0)).count())
// incremental scrub: base = 9 copies (45k), increment = last copy (5k)
val base = spark.read.parquet(s + "/documents.parquet").where(col("doc_id") < 9000000L)
val inc = spark.read.parquet(s + "/documents.parquet").where(col("doc_id") >= 9000000L)
graft.ops.IndexTables.drop(spark, "graft_stress9b_substr_k8")
val idx = time("45k-substring-index-build")(graft.ops.Dedup.substringIndex(base, "graft_stress9b"))
time("5k-substring-apply-vs-45k-index")(graft.ops.Dedup.substringScrubApply(inc, idx).count())
