// Round-14 stress (verdict #6): 10× sf0.1 volume for the round-12/13
// eval additions that had no stress evidence yet — q_best_of_n,
// q_position_bias, q_length_bias, q_calibration_error, q_qa_eval,
// q_ter_shift. Volumes: sf0.1 documents = 5k rows, so each fixture
// below carries ≥10× its query's sf0.1 row count (games/samples scale
// past that since the audits are dictionary-sized aggregations whose
// cost IS the row scan).
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 8g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r14.scala
import org.apache.spark.sql.functions._
import graft.ops.{Preference, TextAnalysis}

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}

// Bench.exercise's anti-pruning trick: a bare count() lets Catalyst
// prune projection-only kernels out of the plan entirely — hash every
// output column so the measured work is the operator's work
def exercise(df: org.apache.spark.sql.DataFrame): Unit = {
  df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
    .agg(expr("bit_xor(h)")).collect()
  ()
}

// ---- q_best_of_n: 500k samples over 5k problems (vs sf0.1's 5k/50) --
val bonSamples = spark.range(500000L).select(
  (col("id") % 5000L).as("problem"),
  col("id").as("draw"),
  (((col("id") * 37) % 1000).cast("double") / 1000.0).as("reward"),
  ((col("id") * 7) % 3 === 0).as("ok")).localCheckpoint()
TextAnalysis.bestOfN(bonSamples, "problem", "draw", "reward", "ok",
  ns = Seq(1, 2, 4, 8)).collect() // warm
time("best_of_n 500k samples / 5k problems / n=1,2,4,8") {
  exercise(TextAnalysis.bestOfN(bonSamples, "problem", "draw", "reward",
    "ok", ns = Seq(1, 2, 4, 8)))
}

// ---- q_position_bias + q_length_bias: 600k games (vs sf0.1's ~6k) --
val games = spark.range(600000L).select(
  (col("id") % 32L).as("winner"), ((col("id") * 13) % 32L).as("loser"))
val judged = games.select(
  when(col("winner") % 2 === 0, col("winner")).otherwise(col("loser")).as("first"),
  when(col("winner") % 2 === 0, col("loser")).otherwise(col("winner")).as("second"),
  (col("winner") % 2 === 0).as("first_wins")).localCheckpoint()
val lenJudged = games.select(col("winner"), col("loser"),
  when((col("winner") * 17 + col("loser") * 3) % 20 < 13,
    lit(200) + col("winner") % 40)
    .otherwise(lit(50) + col("winner") % 30).as("win_len"),
  lit(120).as("lose_len")).localCheckpoint()
Preference.positionBias(judged).collect() // warm
time("position_bias 600k games") {
  Preference.positionBias(judged).show(2, false)
}
time("length_bias 600k games") {
  Preference.lengthBias(lenJudged).show(2, false)
}

// ---- q_calibration_error: 5M scored rows (vs sf0.1's 5k docs) ------
val scored = spark.range(5000000L).select(
  (((col("id") * 37) % 1000).cast("double") / 1000.0).as("quality_score"),
  ((col("id") * 7) % 3 === 0).as("keep_b")).localCheckpoint()
TextAnalysis.calibrationError(scored, "quality_score", "keep_b").collect()
time("calibration_error 5M rows") {
  TextAnalysis.calibrationError(scored, "quality_score", "keep_b")
    .show(2, false)
}

// ---- q_qa_eval + q_ter_shift: 50k synthetic 32-token pairs ---------
// (vs sf0.1's 5k) — shared-vocab sentences, candidate degraded by the
// evalPairs sub/drop rule and ROTATED left by 8 (the r14 fixture), so
// the ter_shift greedy loop actually runs its block-move iterations
val toks = (0 until 32).map(i =>
  concat(lit("w"), (col("id") * (i + 7) + i) % 40))
val pairs0 = spark.range(50000L).select(col("id").as("doc_id"),
  array(toks: _*).as("rt"))
val mut = transform(col("rt"), (x, i) =>
  when((i + 1) % 3 === 0, lit("xx")).otherwise(x))
val ct0 = filter(mut, (_, i) => (i + 1) % 5 =!= 0)
val pairs = pairs0.select(col("doc_id"),
  array_join(col("rt"), " ").as("ref"),
  array_join(concat(slice(ct0, lit(9), size(ct0) - 8), slice(ct0, 1, 8)),
    " ").as("cand")).localCheckpoint()
TextAnalysis.qaEval(pairs.limit(1000), "doc_id", "ref", "cand").collect()
time("qa_eval 50k pairs x 32 tokens") {
  exercise(TextAnalysis.qaEval(pairs, "doc_id", "ref", "cand"))
}
time("ter_shift 50k pairs x 32 tokens (greedy loop live)") {
  exercise(TextAnalysis.terShift(pairs, "doc_id", "ref", "cand"))
}
System.exit(0)
