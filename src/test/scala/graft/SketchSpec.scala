package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates (HLL++ distinct count, quantile sketch): the mergeable
  * fixed-size-state form of distinct/quantile aggregation — at 100 TB the
  * exact forms either shuffle every distinct value (countDistinct) or
  * buffer whole groups (percentile); sketches keep O(1) state per group and
  * combine map-side. Accuracy is the contract, so these specs measure it
  * against the exact aggregates.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx_count_distinct within 5% of exact at 10k distinct keys") {
    // 10k distinct users, skew-free; default rsd = 0.05
    val df = spark.range(100000).select((col("id") % 10000).as("user"))
    val approx = df.agg(approx_count_distinct(col("user"))).head().getLong(0)
    val err = math.abs(approx - 10000.0) / 10000.0
    assert(err <= 0.05, s"approx=$approx err=$err")
  }

  test("HLL with tighter rsd converges; sketch merges across partitions") {
    val df = spark.range(100000).select((col("id") % 10000).as("user"))
      .repartition(16) // merge path: 16 partial sketches combined
    val tight = df.agg(approx_count_distinct(col("user"), 0.01)).head().getLong(0)
    assert(math.abs(tight - 10000.0) / 10000.0 <= 0.01, s"tight=$tight")
  }

  test("quantile sketch is exact when accuracy exceeds group size") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val got = df.agg(expr("approx_percentile(v, array(0.5, 0.9), 10000)"))
      .head().getSeq[Double](0)
    assert(got == Seq(500.0, 900.0), got.toString)
  }

  test("quantile sketch within rank tolerance at low accuracy") {
    val df = (1 to 100000).map(_.toDouble).toDF("v")
    val got = df.agg(expr("approx_percentile(v, 0.5, 100)")).head().getDouble(0)
    // guaranteed rank error <= n/accuracy = 1000 ranks
    assert(math.abs(got - 50000.0) <= 1000.0, got.toString)
  }
}
