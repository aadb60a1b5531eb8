// Round-9d stress rows: margin mining / hubness, A-ES weighted sampling,
// SCD2 history, PSI drift, count-min — at 10x the bench SF.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9d.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"

// 20k vectors (10x the sf0.1 embeddings), 64-d, distinct directions
val emb = spark.read.parquet(d + "/embeddings.parquet")
(0 until 10).map(i => emb
    .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
    .withColumn("embedding", transform(col("embedding"),
      (x, j) => x + (lit(i) * (j + 1) / lit(1000.0)).cast("float"))))
  .reduce(_ union _).write.mode("overwrite").parquet("/tmp/stress9d/emb.parquet")
val bigEmb = spark.read.parquet("/tmp/stress9d/emb.parquet")
println("vecs: " + bigEmb.count())

// margin mining: 286-probe batch against the 20k corpus, exact forward
val probes = bigEmb.where(col("vec_id") % 7 === 0 && col("vec_id") < 1000000L)
val corpus = bigEmb.where(col("vec_id") % 7 =!= 0)
time("20k-margin-mine")(graft.ops.Similarity.marginMine(
  corpus, probes, k = 4, minMargin = 1.0).count())
time("20k-hubness")(graft.ops.Similarity.hubness(
  graft.ops.Similarity.knnAllBrute(corpus, probes, 4)).count())

// IVF-served margin twin on the same corpus (the production path)
val cents = graft.ops.Similarity.ivfCentroids(corpus, k = 16, iters = 3)
val assigned = graft.ops.Similarity.ivfAssign(corpus, cents)
time("20k-margin-ivf-np4")(graft.ops.Similarity.marginMineIvf(
  assigned, corpus, probes, k = 4, minMargin = 1.0, cents, nprobe = 4).count())

// weighted sampling: 500k rows, 20 strata, k=100 each
val wdocs = spark.range(500000L).toDF("doc_id").select(col("doc_id"),
  concat(lit("src"), pmod(col("doc_id"), lit(20))).as("source"),
  (pmod(col("doc_id") * 31, lit(1000)) + 1).cast("double").as("wt"))
time("500k-weighted-sample")(graft.ops.Sampling.weightedSample(
  wdocs, "source", "doc_id", "wt", k = 100).count())

// SCD2: 100k-key / 1M-change stream
val ch = spark.range(1000000L).toDF("event_id").select(col("event_id"),
  pmod(col("event_id") * 17, lit(100000)).as("user_id"),
  timestamp_seconds(lit(1700000000L) + col("event_id")).as("ts"),
  concat(lit("s"), pmod(hash(col("event_id")), lit(4))).as("event_type"))
time("1M-scd2")(graft.ops.History.scd2(ch, "user_id", "ts", "event_id",
  "event_type").count())

// drift: two 500k-row snapshots, 5 buckets
val snapA = wdocs.select((col("wt") * 1.0).as("v"))
val snapB = wdocs.select((col("wt") * 1.07).as("v"))
time("500k-psi-drift")(graft.ops.TextAnalysis.distributionDrift(
  snapA, snapB, "v", Seq(200.0, 400.0, 600.0, 800.0)).count())

// count-min: 10x token stream build + probe
val docs = spark.read.parquet(d + "/documents.parquet")
// parens keep the chain one REPL statement (reduce(...) alone parses
// complete and would orphan the .select continuation line)
val toks10 = ((0 until 10).map(_ => docs).reduce(_ union _)
  .select(explode(graft.ops.Core.tokensUni(col("text"))).as("token")))
time("10x-cms-build-probe") {
  val sk = graft.ops.CountMin.sketch(toks10, "token", depth = 4, width = 256)
  graft.ops.CountMin.estimate(sk,
    Seq("the", "a", "table", "spark").toDF("token"), "token",
    depth = 4, width = 256).count()
}
sys.exit(0)
