package graft

import org.apache.spark.sql.functions._

import graft.ops.Partitioning

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 100).map(i => (s"k${i % 5}", i)).toDF("k", "v")

  test("P1 hash partitioning co-locates keys (Partitions.scala:67-81)") {
    val p = Partitioning.hashPartition(df, 4, col("k"))
    val keyToPid = p.select($"k", spark_partition_id().as("pid"))
      .distinct().as[(String, Int)].collect().groupBy(_._1)
    // every key lives in exactly one partition
    assert(keyToPid.values.forall(_.length == 1))
  }

  test("P2 degenerate partitioner sends everything to one partition " +
      "(Partitions.scala:104-116)") {
    val sizes = Partitioning.partitionSizes(Partitioning.skewToOne(df, 4))
      .as[(Int, Long)].collect().toSeq
    assert(sizes.map(_._2).sum == 100L)
    assert(sizes.count(_._2 > 0) == 1) // all rows in a single partition
  }

  test("P3 rebalance spreads rows round-robin (Partitions.scala:156)") {
    val sizes = Partitioning.partitionSizes(Partitioning.rebalance(df, 4))
      .as[(Int, Long)].collect().toSeq
    assert(sizes.map(_._2).sum == 100L)
    assert(sizes.count(_._2 > 0) == 4) // every partition got rows
  }

  test("P4 coalesce(1) yields a single partition (BuiltIn.scala:104-123)") {
    assert(Partitioning.singleFile(df).rdd.getNumPartitions == 1)
  }
}
