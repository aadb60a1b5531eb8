package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.model.ServerEvent
import graft.ops.Windowing

/** Event-time windows over the reference's canonical 12-event StarCraft
  * fixture — asserts reproduce the hand-traced golden tables in the
  * reference comments (Windows.scala:101-111, 233-241, 295-309, 340-345).
  */
class WindowingSpec extends SparkSpec {
  import spark.implicits._

  private val start = Instant.parse("2022-02-02T00:00:00Z")
  private def events = spark.createDataset(ServerEvent.fixture(start)).toDF()
  private def offs(t: java.sql.Timestamp): Long = (t.getTime - start.toEpochMilli) / 1000

  test("tumbling 3s registration counts = 1/3/2 (Windows.scala:101-111)") {
    val got = Windowing.tumblingCount(
        events.where($"eventType" === "PlayerRegistered"), "eventTime", "3 seconds")
      .select($"w_start", $"cnt").as[(java.sql.Timestamp, Long)]
      .collect().map { case (w, c) => offs(w) -> c }.toMap
    assert(got == Map(0L -> 1L, 3L -> 3L, 6L -> 2L))
  }

  test("tumbling 3s keyed by event type = 7 rows (Windows.scala:233-241)") {
    val got = Windowing.tumblingCount(events, "eventTime", "3 seconds", col("eventType"))
      .select($"w_start", $"eventType", $"cnt").as[(java.sql.Timestamp, String, Long)]
      .collect().map { case (w, k, c) => (offs(w), k) -> c }.toMap
    assert(got.size == 7)
    assert(got == Map(
      (0L, "PlayerRegistered") -> 1L, (0L, "PlayerOnline") -> 1L,
      (3L, "PlayerRegistered") -> 3L, (3L, "PlayerOnline") -> 1L,
      (6L, "PlayerRegistered") -> 2L, (6L, "PlayerOnline") -> 1L,
      (9L, "PlayerOnline") -> 3L))
  }

  test("sliding 3s/1s registration counts (Windows.scala:295-309)") {
    val got = Windowing.slidingCount(
        events.where($"eventType" === "PlayerRegistered"), "eventTime", "3 seconds", "1 second")
      .select($"w_start", $"cnt").as[(java.sql.Timestamp, Long)]
      .collect().map { case (w, c) => offs(w) -> c }.toMap
    assert(got == Map(0L -> 1L, 1L -> 2L, 2L -> 4L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 2L, 7L -> 1L, 8L -> 1L))
  }

  test("session gap 2s: 1 session for bob/sam/mary, 2 for carl/alice/rob " +
      "(Windows.scala:340-345)") {
    val got = Windowing.sessionAgg(events, "eventTime", "2 seconds", "nickname")
      .groupBy("nickname").count().as[(String, Long)].collect().toMap
    assert(got == Map("bob" -> 1L, "sam" -> 1L, "mary" -> 1L,
      "rob" -> 2L, "alice" -> 2L, "carl" -> 2L))
  }

  test("busiest window exercise (Windows.scala:367-391)") {
    val got = Windowing.busiestWindow(events, "eventTime", "2 seconds", "1 second",
        col("eventType") === "PlayerOnline")
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(got.map { case (w, c) => (offs(w), c) } == Seq((10L, 3L)))
  }

  test("count evictor evictBefore vs evictAfter " +
      "(TriggersAndEvictors.scala:245-290 golden: first window partial, then 3s)") {
    // the reference's setup: one event every 500 ms, 10 s tumbling windows,
    // MyCountEvictor(3, runBefore) — golden output (…,2) (…,3) (…,3) (…,3):
    // the first window is partially filled, every later one evicts to 3
    val evs = ((18 to 19) ++ (20 to 79)).zipWithIndex.map { case (halfSec, i) =>
      (i.toLong, new java.sql.Timestamp(start.toEpochMilli + halfSec * 500L))
    }.toDF("event_id", "ts")
    def counts(evictBefore: Boolean): Seq[Long] =
      graft.ops.Evictors
        .windowCountWithEvictor(evs, "ts", "event_id", "10 seconds", 3, evictBefore)
        .orderBy("w_start").select("cnt").as[Long].collect().toSeq
    // evictBefore: the window function sees only the 3 survivors
    assert(counts(evictBefore = true) == Seq(2L, 3L, 3L, 3L))
    // evictAfter: the window function already saw every element; at the
    // terminal fire eviction is unobservable (Flink's semantics)
    assert(counts(evictBefore = false) == Seq(2L, 20L, 20L, 20L))
  }

  test("volume anomalies: spikes and silent windows flag, steady does not") {
    def ts(day: Int, i: Int) = java.sql.Timestamp.from(
      Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(day * 86400L + i * 60L))
    // 6 windows each. A single outlier among n−1 constants sits at
    // z = √(n−1) regardless of its size — n=5 is EXACTLY 2σ (unflagged
    // under the strict >), n=6 is √5 ≈ 2.24σ and flags. Source A spikes
    // on day 5; source B is steady but SILENT on day 2 — the spine must
    // flag the zero, not drop the row.
    val ev = (
      (0 until 5).flatMap(d => (0 until 5).map(i => ("A", ts(d, i)))) ++
        (0 until 25).map(i => ("A", ts(5, i))) ++
        (0 until 6).flatMap(d =>
          if (d == 2) Nil else (0 until 5).map(i => ("B", ts(d, i))))
      ).toDF("event_type", "ts")
    val got = Windowing.volumeAnomalies(ev, "ts", "event_type", "1 day")
      .as[(String, java.sql.Timestamp, Long, Int)].collect()
      .map(r => (r._1, r._2.toInstant.getEpochSecond / 86400 % 100, r._3, r._4))
    val a = got.filter(_._1 == "A").sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(a == Seq((5L, 0), (5L, 0), (5L, 0), (5L, 0), (5L, 0), (25L, 1)), a)
    val b = got.filter(_._1 == "B").sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(b == Seq((5L, 0), (5L, 0), (0L, 1), (5L, 0), (5L, 0), (5L, 0)), b)
    // the n=5 exact-boundary case, checked in the integer algebra: a
    // lone outlier among 4 constants gives (n·cnt−S)² = σ²(n·SS−S²)
    // exactly — 6400 = 6400 for (5,5,5,5,25) — and must NOT flag
    val boundary = (0 until 4).flatMap(d =>
      (0 until 5).map(i => ("C", ts(d, i)))) ++
      (0 until 25).map(i => ("C", ts(4, i)))
    val c = Windowing.volumeAnomalies(boundary.toDF("event_type", "ts"),
        "ts", "event_type", "1 day")
      .as[(String, java.sql.Timestamp, Long, Int)].collect()
    assert(c.forall(_._4 == 0), c.toSeq)
  }

  test("retention cohorts: first-seen week, offsets, churn and return") {
    def ts(week: Int) = java.sql.Timestamp.from(
      Instant.parse("2024-01-01T12:00:00Z").plusSeconds(week * 7L * 86400))
    val ev = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(2)),     // cohort w0, sticks
      (2L, ts(0)), (2L, ts(2)),                  // cohort w0, skips w1
      (3L, ts(1)),                               // cohort w1, churns
      (4L, ts(1)), (4L, ts(1)), (4L, ts(2))      // cohort w1 (dup events)
    ).toDF("user_id", "ts")
    val got = Windowing.retentionCohorts(ev, "ts", "user_id")
      .as[(java.sql.Timestamp, Int, Long)].collect()
      .map(r => (r._1.toInstant.getEpochSecond, r._2) -> r._3).toMap
    val w0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .toInstant.getEpochSecond
    val w1 = w0 + 7L * 86400
    assert(got == Map(
      (w0, 0) -> 2L, (w0, 1) -> 1L, (w0, 2) -> 2L,   // u2 returns at w2
      (w1, 0) -> 2L, (w1, 1) -> 1L), got)
  }

  test("funnel: order matters, same-instant completes, breaks cascade") {
    def ts(m: Int) = java.sql.Timestamp.from(
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(m * 60L))
    val ev = Seq(
      // u1 completes in order
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // u2 clicked BEFORE viewing; the later click converts it anyway
      (2L, ts(0), "click"), (2L, ts(1), "view"), (2L, ts(3), "click"),
      // u3 purchased before clicking: purchase step must NOT count
      (3L, ts(0), "view"), (3L, ts(2), "purchase"), (3L, ts(3), "click"),
      // u4 views only
      (4L, ts(0), "view"),
      // u5 same-instant view+click (>= boundary): both steps complete
      (5L, ts(1), "view"), (5L, ts(1), "click"),
      // u6 never views: a later click can't start the funnel
      (6L, ts(0), "click"), (6L, ts(1), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val times = Windowing.funnelTimes(ev, Seq("view", "click", "purchase"))
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])].collect()
      .map(r => r._1 -> (r._2.isDefined, r._3.isDefined, r._4.isDefined))
      .toMap
    assert(times(1L) == ((true, true, true)))
    assert(times(2L) == ((true, true, false))) // click at t3 >= view at t1
    assert(times(3L) == ((true, true, false))) // purchase pre-click: broken
    assert(times(4L) == ((true, false, false)))
    assert(times(5L) == ((true, true, false))) // same-instant counts
    assert(times(6L) == ((false, false, false)))
    val counts = Windowing.funnelCounts(ev, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(counts == Seq((0, "view", 5L), (1, "click", 4L),
      (2, "purchase", 1L)), counts)

    // incremental fold over ts-ordered batches equals the batch funnel
    val steps = Seq("view", "click", "purchase")
    val cut = ts(2)
    val folded = Windowing.funnelApply(
      Windowing.funnelApply(
        Windowing.funnelTimes(ev.limit(0), steps),  // empty, right schema
        ev.where(col("ts") < lit(cut)), steps),
      ev.where(col("ts") >= lit(cut)), steps)
    assert(folded
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])].collect().toSet ==
      Windowing.funnelTimes(ev, steps)
        .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
          Option[java.sql.Timestamp])].collect().toSet)
  }
}
