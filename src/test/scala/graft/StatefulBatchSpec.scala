package graft

import graft.streaming.Stateful

/** Batch-mode semantics of the keyed-state toolkit: in batch execution each
  * key's group is processed once with empty initial state — the degenerate
  * single-batch case. Cross-batch state evolution is covered by
  * StreamingSpec.
  */
class StatefulBatchSpec extends SparkSpec {
  import spark.implicits._

  private def keyed(xs: (String, Int)*) =
    spark.createDataset(xs).repartition(1).groupByKey(_._1)

  test("X1 running count per key (KeyedState.scala:65-118)") {
    val got = Stateful.runningCount(keyed(("a", 1), ("a", 2), ("b", 3))).collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("X4 count with clear-every-3 (KeyedState.scala:350-360)") {
    val got = Stateful.countWithReset(
        keyed(Seq.fill(7)(("a", 1)): _*), 3).collect().map(_._2).toSeq
    assert(got == Seq(1L, 2L, 3L, 1L, 2L, 3L, 1L))
  }

  test("X2 list state accumulates per key (KeyedState.scala:159-193)") {
    val got = Stateful.accumulateList(keyed(("a", 1), ("a", 2), ("b", 9)), (t: (String, Int)) => t._2)
      .collect().toMap
    assert(got("a").sorted == List(1, 2))
    assert(got("b") == List(9))
  }

  test("X3 map state counts by field (KeyedState.scala:225-256)") {
    val got = Stateful.countByField(
        keyed(("u1", 1), ("u1", 1), ("u1", 2), ("u2", 1)),
        (t: (String, Int)) => s"type${t._2}").collect().toMap
    assert(got("u1") == Map("type1" -> 2L, "type2" -> 1L))
    assert(got("u2") == Map("type1" -> 1L))
  }

  test("G1 count trigger fires cumulative counts every n " +
      "(WindowAssignersAndTriggers.scala:44-90)") {
    val got = Stateful.countTrigger(keyed(Seq.fill(7)(("k", 1)): _*), 3)
      .collect().map(_._2).toSeq
    assert(got == Seq(3L, 6L)) // 7th buffered, not fired
  }

  test("G2 purging count trigger fires n,n,… " +
      "(WindowAssignersAndTriggers.scala:92-116)") {
    val got = Stateful.purgingCountTrigger(keyed(Seq.fill(7)(("k", 1)): _*), 3)
      .collect().map(_._2).toSeq
    assert(got == Seq(3L, 3L))
  }

  test("W4 global window released every n elements (Windows.scala:349-365)") {
    val ds = spark.createDataset(1 to 10).repartition(1)
    val got = Stateful.globalCountWindow(ds, 4).collect().map(_._2).toSeq
    assert(got == Seq(4L, 4L)) // 2 full releases, 2 elements pending
  }

  test("G3 count-or-timeout trigger: count path " +
      "(WindowAssignersAndTriggers.scala:118-245)") {
    val got = Stateful.countOrTimeoutTrigger(keyed(Seq.fill(5)(("k", 1)): _*), 2, 60000L)
    // batch mode: ProcessingTimeTimeout never fires inside one batch —
    // only the count-driven fires appear
    assert(got.collect().map(_._2).toSeq == Seq(2L, 2L))
  }

  test("J4 connect with shared per-key counter " +
      "(HandlingMultipleStreams.scala:212-280)") {
    val a = spark.createDataset(Seq(("Bob", 1), ("Alice", 1))).repartition(1)
    val b = spark.createDataset(Seq("Bob", "Bob")).repartition(1)
    val got = Stateful.connectCount(a, b, (t: (String, Int)) => t._1, (s: String) => s)
      .collect().toMap
    assert(got == Map("Bob" -> 3L, "Alice" -> 1L))
  }
}
