// Round-11 stress B: the new eval/LM/agreement operators at 10× sf0.1
// (50k docs — copies get distinct ids and a per-copy salt token so any
// dictionary op sees fresh grams, the stress-corpus discipline).
// Run: /opt/spark/bin/spark-shell --master 'local[16]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r11b.scala
import org.apache.spark.sql.functions._
import graft.{Tables, SparkEntry}
import graft.ops.{Core, Preference, TextAnalysis}

val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
val docs = ((0 until 10).map { k =>
  docs0.select((col("doc_id") + k * 10000000L).as("doc_id"),
    concat(col("text"), lit(s" salt$k")).as("text"),
    col("lang"), col("source"), col("n_chars"))
}.reduce(_ unionByName _).localCheckpoint())
println("docs=" + docs.count())

def t(tag: String)(f: => Long): Unit = {
  val t0 = System.nanoTime; val n = f
  println(f"STRESS $tag: ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
}

val tk = Core.tokensUni(col("text"))
val cand = array_join(filter(tk, (_, i) => (i + 1) % 3 =!= 0), " ")
val pairs = docs.select(col("doc_id"), array_join(tk, " ").as("ref"),
  cand.as("cand")).localCheckpoint()

t("bleu 50k") { TextAnalysis.bleuScore(pairs, "doc_id", "ref", "cand").count() }
t("chrf 50k") { TextAnalysis.chrF(pairs, "doc_id", "ref", "cand").count() }
t("rougeL 50k") { TextAnalysis.rougeL(pairs, "doc_id", "ref", "cand").count() }
t("lm_ppl 50k (train 97-split + score all)") {
  TextAnalysis.lmPerplexity(docs,
    TextAnalysis.lmCounts(docs.where(col("doc_id") % 97 =!= 0))).count()
}
t("js_div 50k en-vs-rest") {
  TextAnalysis.tokenDivergence(docs.where(col("lang") === "en"),
    docs.where(col("lang") =!= "en")).count()
}
t("vocab_report 50k") { TextAnalysis.vocabReport(docs).count() }
t("fleiss 150k votes") {
  val votes = docs.select(col("doc_id"), explode(array((0 until 3).map(j =>
    (((col("doc_id") % (j + 2)) + (col("doc_id") % 3)) % 3).cast("int")): _*))
    .as("label"))
  Preference.fleissKappa(votes, "doc_id", "label").count()
}
t("sys_compare 50k x 100 replicas") {
  val q = TextAnalysis.qualityClassifierScore(docs)
    .join(docs.select(col("doc_id"), col("n_chars"),
      (col("n_chars") >= 300).cast("int").as("y")), "doc_id")
  val heur = least(lit(1.0), col("n_chars") / 1000.0)
  TextAnalysis.pairedBootstrap(
    q.select(col("doc_id"),
      (lit(1.0) - (col("quality_score") - col("y")) *
        (col("quality_score") - col("y"))).as("m_a"),
      (lit(1.0) - (heur - col("y")) * (heur - col("y"))).as("m_b")),
    "doc_id", "m_a", "m_b").count()
}
sys.exit(0)
