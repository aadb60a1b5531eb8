// Round-10 stress: scd2Serve at 10x — a 600k-change history folded in
// six 100k-change micro-batches through the foreachBatch MERGE, vs the
// one-shot full-history scd2.
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r10d.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
// 20k keys x 30 changes each, timestamps strictly increasing per key,
// values cycling with re-statements (the run-collapse hot path)
val changes = (spark.range(600000L)
  .select((col("id") % 20000).as("user_id"),
    to_timestamp(lit("2024-01-01 00:00:00")).cast("timestamp")
      .as("_t0"),
    col("id").as("event_id"),
    concat(lit("v"), ((col("id") / 20000).cast("long") % 4).cast("string"))
      .as("event_type"))
  .withColumn("ts", col("_t0") + make_dt_interval(lit(0), lit(0),
    (col("event_id") / 20000).cast("long").cast("int"), lit(0)))
  .drop("_t0").localCheckpoint())
println("changes: " + changes.count())
val full = time("scd2-full-600k")(
  graft.ops.History.scd2(changes, "user_id", "ts", "event_id",
    "event_type").count())
var standing = graft.ops.History.scd2(
  changes.where(lit(false)), "user_id", "ts", "event_id", "event_type")
  .localCheckpoint()
val t0 = System.nanoTime()
for (b <- 0 until 6) {
  // batch b = change ordinals [5b, 5b+5) per key: append-only per key
  val batch = changes.where((col("event_id") / 100000).cast("long") === b)
  standing = graft.ops.History.scd2Apply(standing, batch, "user_id",
    "ts", "event_id", "event_type").localCheckpoint()
}
println(f"TIME scd2-serve-6x100k ${(System.nanoTime() - t0) / 1e9}%.2f s")
println("parity: " + (standing.count() == full))
sys.exit(0)
