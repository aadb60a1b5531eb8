// Round-10 stress: KS two-sample at 6M x 6M and merge_asof nearest at
// 6M left x 1M right over 10k keys.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r10c.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val ksa = (spark.range(6000000L)
  .select((col("id") % 9973).cast("double").as("v")).localCheckpoint())
val ksb = (spark.range(6000000L)
  .select(((col("id") * 7 + 500) % 9973).cast("double").as("v"))
  .localCheckpoint())
val ks = time("ks-6M-vs-6M")(
  graft.ops.TextAnalysis.ksTest(ksa, ksb, "v").collect()(0).toString)
val lft = (spark.range(6000000L)
  .select((col("id") % 10000).as("k"), ((col("id") * 37) % 1000000000L).as("t"),
    col("id").as("lid")).localCheckpoint())
val rgt = (spark.range(1000000L)
  .select((col("id") % 10000).as("k"), ((col("id") * 211) % 1000000000L).as("t"),
    (col("id") + 1).as("rv")).localCheckpoint())
val n1 = time("asof-nearest-6M-x-1M-10k-keys")(
  graft.ops.Joins.asofJoinDir(lft, rgt, "k", "t", "lid", "rv",
    "nearest").count())
val n2 = time("asof-backward-6M-x-1M-10k-keys")(
  graft.ops.Joins.asofJoinDir(lft, rgt, "k", "t", "lid", "rv",
    "backward").count())
sys.exit(0)
