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

  test("keySkewReport: hot key ranked first with exact shares, top-N is distributed TakeOrdered") {
    // 60 rows of "hot", then 8 keys x 5 rows: n_rows=100, n_keys=9
    val skewed = ((1 to 60).map(_ => "hot") ++
      (1 to 40).map(i => s"k${i % 8}")).toDF("key").withColumn("v", lit(1))
    val rep = Partitioning.keySkewReport(skewed, "key", topN = 3)
    val rows = rep.as[(Int, String, Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0) == ((1, "hot", 60L, 0.6, 100L, 9L, 5.0, rows(0)._8)))
    assert(rows(0)._8 > 5.0) // p99 pulled up by the hot key
    assert(rows(1)._3 == 5L && rows(1)._4 == 0.05)
    // ties broken by key string: k0 ranks before k1
    assert(rows(1)._2 == "k0" && rows(2)._2 == "k1")
    // the top-N must be TakeOrdered (distributed), never a full-frame
    // unpartitioned window sort over all distinct keys
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
