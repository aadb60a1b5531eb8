// Round-9i stress addendum: PQ / IVF-PQ at 10x bench SF (20k vectors,
// x10 copies of the sf0.1 embeddings).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9i2.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val big = ((0 until 10).map(i =>
    emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
  .reduce(_ union _).localCheckpoint())
println("vecs: " + big.count())

val cb = time("20k-pq-train")(
  graft.ops.Similarity.pqTrain(big, m = 8, k = 16))
time("20k-pq-encode")(
  graft.ops.Similarity.pqEncode(big, cb).count())

graft.ops.IndexTables.drop(spark, "stress9i2_ivfpq")
val trio = time("20k-ivfpq-index-build")(
  graft.ops.Similarity.ivfPqIndex(big, kCells = 64, m = 8, kCodes = 16,
    "stress9i2"))
val (cents, cbs, idx) = trio
val q = {
  big.where(col("vec_id") === 7L)
    .select(col("embedding").cast("array<double>"))
    .head.getSeq[Double](0).toArray
}
time("20k-ivfpq-probe8-short200")(
  graft.ops.Similarity.ivfPqTopK(idx, big, cents, cbs, q, 10,
    nprobe = 8, shortlist = 200).count())
time("20k-ivfpq-probe8-short200-again")(
  graft.ops.Similarity.ivfPqTopK(idx, big, cents, cbs, q, 10,
    nprobe = 8, shortlist = 200).count())
sys.exit(0)
