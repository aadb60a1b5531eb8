// Round-13 stress B: the new eval operators at 10× sf0.1 volume —
// bestOfN (window + per-n struct-max aggregate), the coin-rate audits
// (one-row aggregates — should be scan-bound), calibrationError, and
// the 32-token greedy-shift TER on a 10× pair corpus (its worst
// sanctioned shape).
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 8g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r13b.scala
import org.apache.spark.sql.functions._
import graft.ops.{Core, Preference, TextAnalysis}

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}

// 2.5M samples over 50k problems
val samples = spark.range(2500000L).select(
  (col("id") % 50000L).as("problem"),
  col("id").as("draw"),
  (((col("id") * 37) % 1000).cast("double") / 1000.0).as("reward"),
  ((col("id") * 7) % 3 === 0).as("ok")).localCheckpoint()
TextAnalysis.bestOfN(samples, "problem", "draw", "reward", "ok",
  ns = Seq(1, 2, 4, 8)).count() // warm-up
time("bestOfN 2.5M samples x 50k problems, n up to 8") {
  TextAnalysis.bestOfN(samples, "problem", "draw", "reward", "ok",
    ns = Seq(1, 2, 4, 8)).count()
}
time("positionBias 2.5M games") {
  Preference.positionBias(samples.select((col("draw") % 10 < 6)
    .as("first_wins"))).collect()
}
time("lengthBias 2.5M games") {
  Preference.lengthBias(samples.select(
    (col("draw") % 200).cast("int").as("win_len"),
    lit(97).as("lose_len"))).collect()
}
time("calibrationError 2.5M scored rows") {
  TextAnalysis.calibrationError(samples.select(col("reward").as("s"),
    col("ok").as("y")), "s", "y").collect()
}

// 10× evalpairs-shaped TER-shift corpus: 25k pairs of 32-token slices
val docs0 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
val pairs = ((0 until 10).map { k =>
  docs0.select((col("doc_id") + k * 10000000L).as("doc_id"),
    array_join(slice(Core.tokensUni(col("text")), 1, 32), " ").as("ref"))
}.reduce(_ unionByName _)
  .select(col("doc_id"), col("ref"),
    array_join(filter(Core.tokensUni(col("ref")), (_, i) => (i + 1) % 5 =!= 0),
      " ").as("cand"))
  .localCheckpoint())
println(s"[stress] ter pairs=${pairs.count()}")
time("terShift 10x corpus, 32-token slices") {
  TextAnalysis.terShift(pairs, "doc_id", "ref", "cand").count()
}
System.exit(0)
