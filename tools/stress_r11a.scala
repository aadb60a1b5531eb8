// Round-11 stress A: (1) eval-family timing at sf0.1 off the standing
// scored table (verdict #2 before/after row); (2) 20M-distinct column
// through the adaptive PrefixSum fan-out (verdict #3 stress row).
// Run: /opt/spark/bin/spark-shell --master 'local[16]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r11a.scala
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.ops.{Contracts, TextAnalysis}

val d = "/root/testdata/sf0.1"
def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  println(f"STRESS $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}

val fam = Seq("q_threshold_sweep", "q_auc", "q_ap", "q_clf_report",
  "q_auc_boot", "q_auc_group", "q_auc_incr")
// pass 1 pays the one-time standing-table build; passes 2-3 read it
for (pass <- 1 to 3; name <- fam) {
  t(s"pass$pass $name") { SparkEntry.queries(name)(spark, d).count() }
}

// 20M distinct doubles (past the 15.75M fan-out knee: parts = 81) with
// a skewed count profile; exact percentiles must match the built-in.
// tableProfile(exact = true) is the public surface over exactColumnStats
// (private[graft] — not callable from the REPL).
val big = (spark.range(20000000L)
  .select((col("id").cast("double") / 7.0).as("v"),
    (col("id") % 1000).as("g"))
  .localCheckpoint())
// NB: run the 20M block with --driver-memory 28g — the BUILT-IN
// reference aggregate (percentile's ObjectHashAggregate, the thing the
// dictionary design avoids) needs the headroom, not the profiler.
val prof = t("tableProfile(exact) 20M-distinct") {
  (Contracts.tableProfile(big, Seq("v"))
    .select("n_distinct", "p50", "p95").head)
}
println("STRESS nd=" + prof.getLong(0) + " p50=" + prof.getDouble(1) +
  " p95=" + prof.getDouble(2))
val ref = t("built-in percentile 20M (reference)") {
  (big.agg(expr("round(percentile(v, 0.5), 4)"),
    expr("round(percentile(v, 0.95), 4)")).head)
}
println("STRESS parity p50=" + (prof.getDouble(1) == ref.getDouble(0)) +
  " p95=" + (prof.getDouble(2) == ref.getDouble(1)))

// the same dictionary through scoreDictCum's consumer (exact AUC on a
// 20M-distinct score column — the eval path at adversarial cardinality)
val scored = (big.select(col("v").as("s"),
  (col("g") < 500).cast("int").as("y")))
val auc = t("aucScore 20M-distinct scores") {
  TextAnalysis.aucScore(scored, "s", "y").collect()(0)
}
println("STRESS auc row = " + auc)
sys.exit(0)
