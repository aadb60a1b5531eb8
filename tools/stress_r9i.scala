// Round-9i stress rows: repetition gate, boilerplate scrub (batch +
// index + apply), NB classifier, script mix, classifier report,
// apportionment — at 10x bench SF (50k docs, x10 copies).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9i.scala
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

// Gopher repetition battery (9 gram families + lines/paras, one scan)
val rep = big.select(col("doc_id"), concat(col("text"),
  when(col("doc_id") % 3 === 0,
    lit("\nsubscribe now\nsubscribe now\nsubscribe now"))
    .otherwise(lit(""))).as("text"))
time("50k-gopher-rep")(
  graft.ops.TextAnalysis.gopherRepetition(rep).count())

// boilerplate: batch scrub, index build, 5k apply against 45k index
val inj = big.select(col("doc_id"), concat(col("text"),
  lit("\nsubscribe to our newsletter"),
  when(col("doc_id") % 2 === 0, lit("\nfollow us on twitter"))
    .otherwise(lit(""))).as("text"))
time("50k-boilerplate-batch")(
  graft.ops.Dedup.boilerplateScrub(inj, minDocs = 3).count())
val base = inj.where(col("doc_id") % 10 < 9).localCheckpoint()
val inc = inj.where(col("doc_id") % 10 >= 9).localCheckpoint()
graft.ops.IndexTables.drop(spark, "stress9i_linefreq_b8")
val idx = time("45k-linefreq-index-build")(
  graft.ops.Dedup.lineFreqIndex(base, "stress9i"))
time("5k-boilerplate-apply")(
  graft.ops.Dedup.boilerplateScrubApply(inc, idx, minDocs = 3).count())

// NB classifier: fit (two model-sized aggregates) + scan-stage predict
val model = time("50k-nb-fit")(
  graft.ops.TextAnalysis.nbFit(big, "lang", dim = 64))
time("50k-nb-predict")(
  graft.ops.TextAnalysis.nbPredict(big, model, carry = Seq("lang")).count())
time("50k-nb-prf")(
  graft.ops.TextAnalysis.classifierReport(
    graft.ops.TextAnalysis.nbPredict(big, model, carry = Seq("lang")),
    "lang", "pred").count())

// script mix with injected CJK/Cyrillic segments
val sm = big.select(col("doc_id"), concat(col("text"),
  when(col("doc_id") % 4 === 0, lit(" 机器学习模型训练数据"))
    .otherwise(lit("")),
  when(col("doc_id") % 6 === 0, lit(" обучение моделей данных"))
    .otherwise(lit(""))).as("text"))
time("50k-script-mix")(
  graft.ops.TextAnalysis.scriptMix(sm).count())

// apportionment + the exact-quota draw (window partitioned by source)
time("50k-apportion")(
  graft.ops.Sampling.apportion(
    big.groupBy("source").agg(sum("n_chars").cast("long").as("c")),
    total = 12345L).count())
time("50k-apportion-draw")(
  graft.ops.Sampling.apportionedSample(big, "source", "doc_id",
    total = 12345L).count())
sys.exit(0)
