// Round-13 stress A (verdict #7): the ordinal Krippendorff alpha AT ITS
// DOCUMENTED BOUNDS — a 512-grade scale (the δ² table cap) over 10×
// sf0.1 vote volume; per-item pair expansion is items × distinct-
// grades², so this is the worst legal shape. Also times the nominal
// form on the same votes as the known-good yardstick (the r12
// 170k-vote / 2.29 s precedent) and the round-13 recipe-family
// before/after probe rows.
// Run: /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 8g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/stress_r13a.scala
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Preference

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}

// ~10× the sf0.1 q_kripp vote volume: 600k votes, 60k items, ragged
// 5-25 raters per item, grades over a FULL 512-point ordinal scale
val votes = spark.range(600000L).select(
  (col("id") % 60000L).as("item"),
  (col("id") % 31L).as("rater"),
  (xxhash64(col("id")) % 512L + 512L).cast("int").mod(512).as("grade"))
  .where(xxhash64(col("id"), lit("rag")) % 25L >= (col("id") % 13L))
  .localCheckpoint()
println(s"[stress] votes=${votes.count()}, grades=" +
  s"${votes.select(countDistinct("grade")).head.getLong(0)}")

// warm-up (codegen + shuffle machinery)
Preference.krippAlpha(votes, "item", "grade").collect()

time("kripp nominal 600k votes") {
  Preference.krippAlpha(votes, "item", "grade").collect()
}
time("kripp ordinal 600k votes x 512 grades") {
  Preference.krippAlphaOrdinal(votes, "item", "grade").collect()
}
time("kripp interval 600k votes") {
  Preference.krippAlphaInterval(votes, "item", "grade").collect()
}
System.exit(0)
