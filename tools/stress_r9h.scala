// Round-9h stress rows: data-selection & labeler-QA wave (DSIR fit +
// scoring, secret scan, weak labels -> kappa/calibration, mixture
// solve) at 10x bench SF (50k docs, x10 copies).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9h.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
val big = ((0 until 10).map(i =>
    docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).localCheckpoint())
println("docs: " + big.count())

// DSIR: fit (two zero-shuffle passes + dim collect), then scan-score
val lr = time("50k-dsir-fit")(
  graft.ops.TextAnalysis.dsirLogRatios(big,
    big.where(col("lang") === "en")))
time("50k-dsir-score")(
  graft.ops.TextAnalysis.dsirScores(big, lr).count())

// secret scan with the q_secret_scan injection shape
val inj = big.select(col("doc_id"), concat(col("text"),
  when(col("doc_id") % 7 === 0,
    concat(lit(" key_"), md5(col("doc_id").cast("string"))))
    .otherwise(lit("")),
  when(col("doc_id") % 11 === 0,
    lit(" aaaaaaaaaaaaaaaaaaaaaaaa")).otherwise(lit(""))).as("text"))
time("50k-secret-scan")(
  graft.ops.TextAnalysis.secretScan(inj).count())

// weak labels + kappa + calibration (one scan each)
time("50k-weak-labels")(
  graft.ops.TextAnalysis.weakLabels(big).count())
val wl = graft.ops.TextAnalysis.weakLabels(big).localCheckpoint()
time("50k-kappa")(
  graft.ops.TextAnalysis.cohenKappa(wl, "keep_a", "keep_b").count())
time("50k-calibration")(
  graft.ops.TextAnalysis.calibrationReport(wl, "quality_score", "keep_b")
    .count())

// Gopher structural rules (integer-exact, one scan)
time("50k-gopher-rules")(
  graft.ops.TextAnalysis.gopherRules(big).count())

// mixture solve over the 20-domain inventory
time("50k-mix-solve")(
  graft.ops.Sampling.mixtureSolve(
    big.groupBy(col("source").as("domain"))
      .agg(sum(size(graft.ops.Core.tokensUni(col("text")))).cast("long")
        .as("n_tokens")),
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
    maxEpochs = 2.0).count())
sys.exit(0)
