// Round-10 stress: Bradley-Terry at 10x-plus scale — 6M games over 10k
// items (the pairs->graph collapse is the scale mechanism: iterations
// touch only the ~86k-edge graph, never the 6M game rows again).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r10b.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val n = 6000000L
val items = 10000L
val games = (spark.range(n)
  .select((col("id") % items).as("a"),
    ((col("id") * 7 + 13) % items).as("b"),
    ((col("id") * 13) % 7 < 4).as("sw"))
  .where(col("a") =!= col("b"))
  .select(
    when(col("sw"), least(col("a"), col("b")))
      .otherwise(greatest(col("a"), col("b"))).as("winner"),
    when(col("sw"), greatest(col("a"), col("b")))
      .otherwise(least(col("a"), col("b"))).as("loser"))
  .localCheckpoint())
println("games: " + games.count())
val r = time("bt-ratings-6M-games-10k-items-3it")(
  graft.ops.Preference.btRatings(games, iterations = 3)
    .agg(count(lit(1)), round(sum("rating"), 2)).collect()(0).toString)
// logisticFit at 5M rows x 4 features, 3 full-batch GD steps
val feats = (spark.range(5000000L)
  .select(col("id"),
    (col("id") % 97).cast("double").as("f0"),
    ((col("id") * 7) % 89).cast("double").as("f1"),
    ((col("id") * 13) % 83).cast("double").as("f2"),
    ((col("id") * 31) % 79).cast("double").as("f3"))
  .withColumn("y", ((col("f0") - col("f1") * 0.5) > 20).cast("int"))
  .localCheckpoint())
val w = time("logistic-fit-5M-rows-3it")(
  graft.ops.TextAnalysis.logisticFit(feats, Seq("f0","f1","f2","f3"), "y",
    iterations = 3, lr = 0.1).mkString(","))
// exact AUC + sweep at 6M scored rows (score on a round-4 grid: the
// dictionary the prefix sum runs over is grid-sized, not corpus-sized)
val scored = (spark.range(6000000L)
  .select(col("id"),
    (round((col("id") % 9973).cast("double") / 9973, 4)).as("s"),
    ((col("id") % 3) === 0).cast("int").as("y"))
  .localCheckpoint())
val a = time("auc-6M-rows")(
  graft.ops.TextAnalysis.aucScore(scored, "s", "y").collect()(0).toString)
val sw = time("threshold-sweep-6M-rows")(
  graft.ops.TextAnalysis.thresholdSweep(scored, "s", "y").count())
// Poisson bootstrap: 1M rows x 100 replicas = 100M weighted draws
val scored1m = (spark.range(1000000L)
  .select(col("id"),
    (round((col("id") % 997).cast("double") / 997, 4)).as("s"),
    ((col("id") % 3) === 0).cast("int").as("y"))
  .localCheckpoint())
val bs = time("auc-bootstrap-1M-rows-100-replicas")(
  graft.ops.TextAnalysis.aucBootstrap(scored1m, "id", "s", "y",
    replicas = 100).collect()(0).toString)
sys.exit(0)
