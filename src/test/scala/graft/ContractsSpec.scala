package graft

import graft.ops.Contracts
import org.apache.spark.sql.functions._

/** Data-contract violations + k-anonymity publish gate. */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  test("violations: null predicates violate, one scan serves all rules") {
    val df = Seq(
      (1L, Some(5), "a"), (2L, Some(-1), "b"), (3L, None, "a"),
      (4L, Some(9), "zz")
    ).toDF("id", "v", "tag")
    val got = Contracts.violations(df, Seq(
      "v_positive" -> (col("v") > 0),          // row 2 false, row 3 NULL
      "tag_short" -> (length(col("tag")) < 2), // row 4
      "always_ok" -> lit(true)), "id")
      .as[(String, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // an unevaluable contract (NULL) is a broken contract
    assert(got("v_positive") == ((2L, Some(2L), 4L)), got("v_positive"))
    assert(got("tag_short") == ((1L, Some(4L), 4L)))
    assert(got("always_ok") == ((0L, None, 4L)))
    // all rules ride ONE aggregate: a single scan of the input
    val plan = Contracts.violations(df, Seq("a" -> (col("v") > 0),
      "b" -> (col("v") < 9)), "id").queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ".r.findAllIn(plan).length <= 1, plan)
  }

  test("kAnonymity counts small QI cells, rows at risk, null QI cells") {
    val df = Seq(
      ("en", 1), ("en", 1), ("en", 1),   // cell of 3: safe at k=3
      ("de", 1), ("de", 1),              // cell of 2: at risk
      ("fr", 2),                         // cell of 1: at risk
      (null, 2), (null, 2)               // null QI is its own cell (2)
    ).toDF("lang", "b")
    val got = Contracts.kAnonymity(df, Seq("lang", "b"), k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((4L, 3L, 5L, 1L)), got)
  }
}
