package graft

import java.sql.Timestamp

import graft.ops.History
import org.apache.spark.sql.functions._

/** SCD2 attribute history + point-in-time reconstruction. */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def changes = Seq(
    // user 1: a→a (re-statement, no new version)→b→a
    (1L, t("2024-01-01 00:00:00"), 10L, "a"),
    (1L, t("2024-01-02 00:00:00"), 11L, "a"),
    (1L, t("2024-01-03 00:00:00"), 12L, "b"),
    (1L, t("2024-01-04 00:00:00"), 13L, "a"),
    // user 2: x→null→x (null is a real state)
    (2L, t("2024-01-01 12:00:00"), 20L, "x"),
    (2L, t("2024-01-02 12:00:00"), 21L, null),
    (2L, t("2024-01-03 12:00:00"), 22L, "x"),
    // user 3: same-instant tie broken by ord — empty interval retained
    (3L, t("2024-01-05 00:00:00"), 30L, "p"),
    (3L, t("2024-01-05 00:00:00"), 31L, "q")
  ).toDF("user_id", "ts", "event_id", "event_type")

  private def hist = History.scd2(changes, "user_id", "ts", "event_id",
    "event_type")

  test("scd2 collapses runs, keeps nulls and empty-interval versions") {
    val got = hist
      .as[(Long, Int, Option[String], Timestamp, Option[Timestamp], Int)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 1, Some("a"), t("2024-01-01 00:00:00"), Some(t("2024-01-03 00:00:00")), 0),
      (1L, 2, Some("b"), t("2024-01-03 00:00:00"), Some(t("2024-01-04 00:00:00")), 0),
      (1L, 3, Some("a"), t("2024-01-04 00:00:00"), None, 1),
      (2L, 1, Some("x"), t("2024-01-01 12:00:00"), Some(t("2024-01-02 12:00:00")), 0),
      (2L, 2, None, t("2024-01-02 12:00:00"), Some(t("2024-01-03 12:00:00")), 0),
      (2L, 3, Some("x"), t("2024-01-03 12:00:00"), None, 1),
      (3L, 1, Some("p"), t("2024-01-05 00:00:00"), Some(t("2024-01-05 00:00:00")), 0),
      (3L, 2, Some("q"), t("2024-01-05 00:00:00"), None, 1)), got)
  }

  test("asOf reconstructs each instant, half-open boundaries") {
    def at(s: String) = History.asOf(hist, "user_id", lit(t(s)))
      .select("user_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(at("2024-01-02 00:00:01") == Map(1L -> Some("a"), 2L -> Some("x")))
    // boundary: a version starting exactly at ts is live, the closed one gone
    assert(at("2024-01-03 00:00:00")(1L) == Some("b"))
    assert(at("2024-01-02 12:00:00")(2L) == None) // the null state is live
    // before a key exists it is absent
    assert(!at("2024-01-02 00:00:00").contains(3L))
    // the empty interval [t, t) is never live — p loses the same-ts race
    assert(at("2024-01-05 00:00:00")(3L) == Some("q"))
  }

  test("scd2Apply: incremental fold equals the full-history recompute") {
    val extra = Seq(
      (4L, t("2024-01-01 00:00:00"), 40L, "p"),  // will be RE-STATED in batch
      (4L, t("2024-01-06 00:00:00"), 41L, "p"),
      (5L, t("2024-01-01 00:00:00"), 50L, "q")   // untouched by the batch
    ).toDF("user_id", "ts", "event_id", "event_type")
    val all = changes.unionByName(extra)
    val cut = t("2024-01-03 00:00:00")
    val first = all.where(col("ts") < lit(cut))
    val batch = all.where(col("ts") >= lit(cut))   // user 3 is NEW here
    val incr = History.scd2Apply(
      History.scd2(first, "user_id", "ts", "event_id", "event_type"),
      batch, "user_id", "ts", "event_id", "event_type")
      .as[(Long, Int, Option[String], Timestamp, Option[Timestamp], Int)]
      .collect().toSet
    val full = History.scd2(all, "user_id", "ts", "event_id", "event_type")
      .as[(Long, Int, Option[String], Timestamp, Option[Timestamp], Int)]
      .collect().toSet
    assert(incr == full,
      s"only-incr=${incr -- full}\nonly-full=${full -- incr}")
  }

  test("scd2Apply fails fast on a batch that would rewrite sealed history") {
    val first = changes.where(col("ts") < lit(t("2024-01-03 00:00:00")))
    val hist1 = History.scd2(first, "user_id", "ts", "event_id", "event_type")
    // user 1's current (run-collapsed) version opened 2024-01-01; this
    // change predates it
    val bad = Seq((1L, t("2023-12-31 00:00:00"), 99L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val e = intercept[IllegalArgumentException] {
      History.scd2Apply(hist1, bad, "user_id", "ts", "event_id",
        "event_type")
    }
    assert(e.getMessage.contains("sealed history"), e.getMessage)
    // validate = false skips the guard (caller-enforced feeds)
    History.scd2Apply(hist1, bad, "user_id", "ts", "event_id",
      "event_type", validate = false).count()
  }

  test("one exchange serves both window passes") {
    val plan = hist.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
  }
}
