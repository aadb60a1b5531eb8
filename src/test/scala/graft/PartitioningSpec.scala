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

  test("zOrdered: hand bit-interleave at bits=1 and bits=2") {
    val grid1 = Seq((0, 0), (1, 0), (0, 1), (1, 1)).toDF("a", "b")
    val z1 = Partitioning.zOrdered(grid1, Seq("a", "b"), bits = 1,
        statsOverride = Map("a" -> (0L, 1L), "b" -> (0L, 1L)))
      .select($"a", $"b", $"zval").as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // column 0's bit lands at position 0, column 1's at position 1
    assert(z1 == Map((0, 0) -> 0L, (1, 0) -> 1L, (0, 1) -> 2L,
      (1, 1) -> 3L))
    val grid2 = Seq((3, 0), (0, 3), (3, 3), (1, 2)).toDF("x", "y")
    val z2 = Partitioning.zOrdered(grid2, Seq("x", "y"), bits = 2,
        statsOverride = Map("x" -> (0L, 3L), "y" -> (0L, 3L)))
      .select($"x", $"y", $"zval").as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // x=3 -> bits at positions 0,2 = 5; y=3 -> positions 1,3 = 10
    assert(z2 == Map((3, 0) -> 5L, (0, 3) -> 10L, (3, 3) -> 15L,
      (1, 2) -> 9L))
  }

  test("zOrderAudit: every bucket bounds EVERY column's span " +
      "(range/sqrt(buckets)), where a one-column sort cannot)") {
    // full 32x32 grid; 16 buckets over a 10-bit key consume the top 2
    // bits of each column -> each bucket is an exact 8x8 subgrid
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    val audit = Partitioning.zOrderAudit(grid, Seq("x", "y"), bits = 5,
        nBuckets = 16)
      .as[(Long, Long, Long, Long)].collect()
    assert(audit.length == 16)
    assert(audit.map(_._2).sum == 1024L)
    assert(audit.forall { case (_, n, sx, sy) =>
      n == 64L && sx == 7L && sy == 7L })
    // contrast: bucketing a single-column sort the same 16 ways leaves
    // the second column's span at the FULL range
    val sorted = grid.withColumn("bucket", ($"x" / lit(2)).cast("int"))
    val spans = sorted.groupBy("bucket")
      .agg(org.apache.spark.sql.functions.max($"y") -
        org.apache.spark.sql.functions.min($"y"))
      .as[(Int, Int)].collect()
    assert(spans.length == 16 && spans.forall(_._2 == 31))
  }

  test("zOrdered: computed min/max path matches statsOverride, guards " +
      "reject bad shapes") {
    val grid = Seq((0, 0), (1, 1), (3, 2)).toDF("x", "y")
    val a = Partitioning.zOrdered(grid, Seq("x", "y"), 2)
      .select($"x", $"zval").as[(Int, Long)].collect().toSet
    val b = Partitioning.zOrdered(grid, Seq("x", "y"), 2,
        statsOverride = Map("x" -> (0L, 3L), "y" -> (0L, 2L)))
      .select($"x", $"zval").as[(Int, Long)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Partitioning.zOrdered(grid, Seq("x"), 2) // < 2 columns
    }
    intercept[IllegalArgumentException] {
      Partitioning.zOrdered(grid, Seq("x", "y"), 32) // 64 bits > 62
    }
    intercept[IllegalArgumentException] {
      Partitioning.zOrderAudit(grid, Seq("x", "y"), 2, nBuckets = 10)
    }
  }
}
