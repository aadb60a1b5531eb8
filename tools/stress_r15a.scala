// Round-15 stress A — the round-14 verdict #1 "done" row: the BOUNDED
// semdedup decision on the adversarial 500k replica corpus (the r14b
// shape whose argmax blocking collapsed 43% of docs into ONE block and
// priced the unbounded decision at 140-480 s for just 50k docs) must
// land within ~2x of the same decision on a SPREAD corpus of identical
// size and vector cost. Three timed rows:
//   1. blockOccupancy telemetry on both shapes (what the engine sees
//      before paying);
//   2. semanticDedupFlagsBounded on the COLLAPSED corpus (hierarchical
//      refine + anchor arm carry the replica mass at O(leaf));
//   3. semanticDedupFlagsBounded on the SPREAD twin (each vector's
//      components rotated by vec_id % 64, so argmax spreads uniformly —
//      same row count, same dims, same dot cost).
// Output columns are hashed (xxhash64 struct -> bit_xor), never bare
// .count(): the r14 lesson — a count lets Catalyst prune the kernels
// under test.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 48g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//   --conf spark.sql.warehouse.dir=/tmp/stress_r15a_wh \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r15a.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.ops.{Similarity, TextAnalysis}

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

val emb = time("hashEmbed 500k (collapsed shape)") {
  TextAnalysis.hashEmbed(docs, dim = 64).localCheckpoint()
}
// spread twin: rotate components by vec_id % 64 — argmax lands uniformly
val spreadEmb = time("rotate -> spread twin") {
  (emb.select(col("vec_id"),
    (pmod(col("vec_id"), lit(64)) + 1).cast("int").as("_r"),
    col("embedding"))
    .select(col("vec_id"),
      concat(slice(col("embedding"), col("_r"), lit(64) - col("_r") + 1),
        slice(col("embedding"), lit(1), col("_r") - 1)).as("embedding"))
    .localCheckpoint())
}

time("blockOccupancy (collapsed, level-1 argmax)") {
  Similarity.blockOccupancy(Similarity.argmaxBlocked(emb)).show(false)
}
time("blockOccupancy (spread twin)") {
  Similarity.blockOccupancy(Similarity.argmaxBlocked(spreadEmb)).show(false)
}

val tCollapsed = {
  val t0 = System.nanoTime()
  exercise(Similarity.semanticDedupFlagsBounded(emb, minCos = 0.9,
    maxBlock = 1024, levels = 2), "bounded collapsed")
  val t = (System.nanoTime() - t0) / 1e9
  println(f"[stress] bounded semdedup COLLAPSED 500k: $t%.2f s")
  t
}
val tSpread = {
  val t0 = System.nanoTime()
  exercise(Similarity.semanticDedupFlagsBounded(spreadEmb, minCos = 0.9,
    maxBlock = 1024, levels = 2), "bounded spread")
  val t = (System.nanoTime() - t0) / 1e9
  println(f"[stress] bounded semdedup SPREAD 500k: $t%.2f s")
  t
}
println(f"[stress] collapsed/spread ratio: ${tCollapsed / tSpread}%.2f (target <= ~2)")
sys.exit(0)
