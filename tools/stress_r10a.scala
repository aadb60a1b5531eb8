// Round-10 stress row (verdict #4): the occupancy-routed salted APPLY
// against a DEGENERATE snapshot — one 20k-row block — vs the unrouted
// bucket-join form. The batch-side occupancy telemetry was recorded in
// round 9; this times the apply arm the router actually protects.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r10a.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
// 20k snapshot vectors + 2k increment vectors, ALL in one block: ten
// id-shifted copies of the 2k-vector table, block forced constant —
// the worst case blockOccupancy can report (max_share = 1.0)
val blocked0 = (graft.ops.Similarity.argmaxBlocked(emb)
  .withColumn("block", lit(0L)))
val snapRows = ((0 until 10).map(i =>
    blocked0.select((col("vec_id") + lit(i * 10000L)).as("vec_id"),
      col("block"), col("e")))
  .reduce(_ union _).localCheckpoint())
val incRows = (blocked0
  .select((col("vec_id") + lit(100000L)).as("vec_id"), col("block"),
    col("e")).localCheckpoint())
// the 100k-row block: where the single-bucket-task form actually hurts
val snapRows50 = ((0 until 50).map(i =>
    blocked0.select((col("vec_id") + lit(i * 10000L)).as("vec_id"),
      col("block"), col("e")))
  .reduce(_ union _).localCheckpoint())
val incRows2 = ((0 until 2).map(i =>
    blocked0.select((col("vec_id") + lit(1000000L + i * 10000L))
      .as("vec_id"), col("block"), col("e")))
  .reduce(_ union _).localCheckpoint())
println("snap: " + snapRows.count() + " inc: " + incRows.count())
graft.ops.IndexTables.drop(spark, "stress10a_idx_b16")
val idx = graft.ops.IndexTables.bucketed(spark, "stress10a_idx", 16,
  Seq("block"), Seq("vec_id"))(snapRows)
// warmup both forms once (reader/codegen), then time
// ONE paren group per def: an unparenthesized trailing `.agg` line after
// a complete call is a SEPARATE REPL statement (the recurring -I trap)
def routed() = (graft.ops.Similarity.semanticDedupFlagsApply(
  idx, incRows, minCos = 0.95)
  .agg(sum("is_dup")).collect()(0).getLong(0))
def unrouted() = (graft.ops.Similarity.semanticDedupFlagsApply(
  idx, incRows, minCos = 0.95, maxBlock = Int.MaxValue)
  .agg(sum("is_dup")).collect()(0).getLong(0))
val r1 = time("salted-routed-apply-warm0")(routed())
val r2 = time("salted-routed-apply")(routed())
val u1 = time("unrouted-bucket-apply-warm0")(unrouted())
val u2 = time("unrouted-bucket-apply")(unrouted())
println("verdict parity 20k: " + (r1 == u1 && r2 == u2) +
  " (dups=" + r1 + ")")
graft.ops.IndexTables.drop(spark, "stress10a_idx50_b16")
val idx50 = graft.ops.IndexTables.bucketed(spark, "stress10a_idx50", 16,
  Seq("block"), Seq("vec_id"))(snapRows50)
println("snap50: " + snapRows50.count() + " inc2: " + incRows2.count())
def routed50() = (graft.ops.Similarity.semanticDedupFlagsApply(
  idx50, incRows2, minCos = 0.95)
  .agg(sum("is_dup")).collect()(0).getLong(0))
def unrouted50() = (graft.ops.Similarity.semanticDedupFlagsApply(
  idx50, incRows2, minCos = 0.95, maxBlock = Int.MaxValue)
  .agg(sum("is_dup")).collect()(0).getLong(0))
val r3 = time("salted-routed-apply-100k-warm0")(routed50())
val r4 = time("salted-routed-apply-100k")(routed50())
val u3 = time("unrouted-bucket-apply-100k-warm0")(unrouted50())
val u4 = time("unrouted-bucket-apply-100k")(unrouted50())
println("verdict parity 100k: " + (r3 == u3 && r4 == u4) +
  " (dups=" + r3 + ")")
sys.exit(0)
