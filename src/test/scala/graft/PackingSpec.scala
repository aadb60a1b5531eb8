package graft

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map { i =>
    // token counts 1..20, deterministic
    (i, (0 until (i % 20 + 1).toInt).map(j => s"w$j").mkString(" "), "en")
  }.toDF("doc_id", "text", "lang")

  test("every doc assigned exactly once; no shard over budget") {
    val got = Packing.packByTokenBudget(docs, budget = 50, parts = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == (0L until 200L)) // exhaustive, once
    val perShard = got.groupBy(_._3).map { case (_, rows) => rows.map(_._2).sum }
    assert(perShard.forall(_ <= 50L), s"over-budget shard: $perShard")
  }

  test("oversized single doc gets its own shard, others stay bounded") {
    val wide = Seq((1L, (0 until 100).map(j => s"w$j").mkString(" "), "en"),
      (2L, "a b", "en"), (3L, "c d", "en")).toDF("doc_id", "text", "lang")
    val got = Packing.packByTokenBudget(wide, budget = 10, parts = 1)
      .as[(Long, Long, Long)].collect()
    val byShard = got.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byShard.values.exists(_ == Set(1L))) // the oversize doc is alone
  }

  test("deterministic across runs and input partition layout") {
    val a = Packing.packByTokenBudget(docs, 50, parts = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Packing.packByTokenBudget(docs.repartition(7), 50, parts = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b) // repartition(parts, key) re-establishes the layout
  }

  test("shards are reasonably full (waste bounded)") {
    val got = Packing.packByTokenBudget(docs, budget = 50, parts = 4)
      .as[(Long, Long, Long)].collect()
    val fills = got.groupBy(_._3).map { case (_, r) => r.map(_._2).sum }.toSeq
    // all but the tail shard of each partition should be >60% full
    val underfull = fills.count(_ < 30L)
    assert(underfull <= 4, s"fills=$fills") // ≤ one tail shard per partition
  }
}
