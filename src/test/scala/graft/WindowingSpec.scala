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
}
