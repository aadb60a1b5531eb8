package graft

import java.sql.Timestamp

import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Double) = new Timestamp(Math.round(s * 1000))

  test("union merges same-typed streams (HandlingMultipleStreams.scala:49-85)") {
    val a = Seq(("Bob", "add"), ("Alice", "add")).toDF("user_id", "event_type")
    val b = Seq(("Bob", "add")).toDF("user_id", "event_type")
    val got = Joins.unionCounts(a, b, "user_id").as[(String, Long)].collect().toMap
    assert(got == Map("Bob" -> 2L, "Alice" -> 1L))
  }

  test("salted join: identical result to unsalted, hot key spread over salts") {
    // 'hot' carries 90% of the fact side — the single-reducer straggler shape
    val fact = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("key", "attr")
    val plain = fact.join(dim, "key").select("key", "v", "attr")
      .as[(String, Int, Int)].collect().toSet
    val salted = graft.ops.Partitioning.saltedJoin(fact, dim, "key", salts = 8)
      .select("key", "v", "attr").as[(String, Int, Int)].collect().toSet
    assert(salted == plain) // result-set equality
    // and the hot key's rows really spread: >1 distinct salt in use
    import org.apache.spark.sql.functions._
    val salts = fact.where(col("key") === "hot")
      .select(pmod(xxhash64(struct(col("key"), col("v"))), lit(8)))
      .distinct().count()
    assert(salts > 4, s"hot key used only $salts salt values")
  }

  test("window join pairs same key in same tumbling bucket " +
      "(HandlingMultipleStreams.scala:87-129)") {
    val cart = Seq(("Bob", ts(1)), ("Bob", ts(11)), ("Alice", ts(2)))
      .toDF("user_id", "time")
    val catalog = Seq(("Bob", ts(5)), ("Alice", ts(15)), ("Tom", ts(5)))
      .toDF("user_id", "time")
    val got = Joins.windowJoinCount(cart, catalog, "user_id", "time", "10 seconds")
      .as[(Timestamp, Long)].collect().toMap
    // only Bob@1s × Bob@5s share bucket [0,10); Alice's events are in
    // different buckets; Tom has no cart event
    assert(got == Map(ts(0) -> 1L))
  }

  test("interval join: exclusive ±2s bounds (HandlingMultipleStreams.scala:131-210)") {
    val a = Seq((1L, "Bob", ts(10))).toDF("event_id", "user_id", "time")
    val b = Seq(
      (20L, "Bob", ts(8)),     // == lower bound → excluded (exclusive)
      (21L, "Bob", ts(8.001)), // just inside
      (22L, "Bob", ts(11.5)),  // inside
      (23L, "Bob", ts(12)),    // == upper bound → excluded
      (24L, "Tom", ts(10))     // wrong key
    ).toDF("event_id", "user_id", "time")
    val got = Joins.intervalJoin(a, b, "user_id", "time", "event_id", "2 SECONDS")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 21L), (1L, 22L)))
  }

  test("as-of join: latest right value at-or-before each left row") {
    val left = Seq(
      (1L, 1L, "L0"), // before any right row → dropped (inner semantics)
      (1L, 3L, "L1"), // equal ts: the t=3 right row itself matches
      (1L, 5L, "L2"), // latest right at-or-before t=5 is t=4
      (2L, 4L, "L3")  // key 2's only right row is later → dropped
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "C"), (2L, 9L, "D")
    ).toDF("k", "t", "rv")
    val got = Joins.asofJoin(left, right, "k", "t", "lid", "rv")
      .select("lid", "rv").as[(String, String)].collect().toMap
    assert(got == Map("L1" -> "B", "L2" -> "C"))
  }

  test("asofJoinDir: backward ≡ asofJoin; forward, nearest, tolerance") {
    val left = Seq(
      (1L, 1L, "L0"), // before any right → fwd matches t=2, back drops
      (1L, 3L, "L1"), // equal ts matches both directions (the t=3 row)
      (1L, 5L, "L2"), // back t=4 (d=1), fwd none → back
      (2L, 4L, "L3"), // back none, fwd t=9 (d=5)
      (1L, 2L, "L4")  // exact right hit
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "C"), (2L, 9L, "D")
    ).toDF("k", "t", "rv")
    def run(dir: String, tol: Option[Double] = None) =
      Joins.asofJoinDir(left, right, "k", "t", "lid", "rv", dir, tol)
        .select("lid", "rv").as[(String, String)].collect().toMap
    // backward ≡ the base asofJoin on the shared fixture rows
    assert(run("backward") ==
      Map("L1" -> "B", "L2" -> "C", "L4" -> "A"))
    assert(run("forward") ==
      Map("L0" -> "A", "L1" -> "B", "L3" -> "D", "L4" -> "A"))
    // nearest: L0 fwd-only; L2 back-only; L3 fwd-only; equal-distance
    // tie at L5 below exercises tie → backward
    assert(run("nearest") ==
      Map("L0" -> "A", "L1" -> "B", "L2" -> "C", "L3" -> "D", "L4" -> "A"))
    // tolerance: L3's only match is 5 away → dropped at tol 4
    assert(run("nearest", Some(4.0)) ==
      Map("L0" -> "A", "L1" -> "B", "L2" -> "C", "L4" -> "A"))
    // exact-tie → backward: left at t=3 with rights at t=2 and t=4 only
    val l2 = Seq((9L, 3L, "T")).toDF("k", "t", "lid")
    val r2 = Seq((9L, 2L, "lo"), (9L, 4L, "hi")).toDF("k", "t", "rv")
    assert(Joins.asofJoinDir(l2, r2, "k", "t", "lid", "rv", "nearest")
      .select("rv").as[String].collect().toSeq == Seq("lo"))
  }

  test("rangeLookup: equals the theta join, boundaries half-open, plan is a hash join") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // overlapping intervals, some inverted/empty (must match nothing),
    // points landing exactly on lo (in) and hi (out)
    // negative coordinates included: floor-division bins must stay
    // monotone across zero (truncating division would not)
    val dims = ((1 to 30).map { i =>
      val lo = (rnd.nextInt(200) - 100).toDouble
      (i, lo, lo + rnd.nextInt(60) - 5) // ~8% inverted/empty
    } :+ ((31, 50.0, 50.0)) :+ ((32, 80.0, 70.0)) :+ ((33, -10.0, 10.0)))
      .toDF("band_id", "lo", "hi")
    val facts = ((1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(220) - 110).toDouble)) ++
      Seq((1001L, 50.0), (1002L, 110.0), (1003L, -10.0), (1004L, -0.5)))
      .toDF("fact_id", "pt")
    val got = Joins.rangeLookup(facts, dims, "pt", "lo", "hi", binWidth = 16.0)
      .select("fact_id", "band_id").as[(Long, Int)].collect().toSet
    val exp = facts.join(dims, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("fact_id", "band_id").as[(Long, Int)].collect().toSet
    assert(got == exp)
    // the whole point: bin expansion turns the interval predicate into an
    // equi-join — no nested-loop/cartesian anywhere in the plan (the
    // naive theta join above IS a BroadcastNestedLoopJoin)
    val plan = Joins.rangeLookup(facts, dims, "pt", "lo", "hi", 16.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.linesIterator.take(8).mkString("\n"))
    val naive = facts.join(dims, col("pt") >= col("lo") && col("pt") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") ||
      naive.contains("CartesianProduct"))
    // the silent-explosion guard fails fast, and the message names the knob
    val e = intercept[IllegalArgumentException] {
      Joins.rangeLookup(facts, dims, "pt", "lo", "hi", binWidth = 16.0,
        maxBinsPerRow = 2L)
    }
    assert(e.getMessage.contains("binWidth"))
  }

  test("rangeLookup streams as-is: stream-static equi-join, append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    // facts are the stream, the (tiny, standing) dimension is static: bin
    // expansion keeps the join a stream-static EQUI-join — Structured
    // Streaming supports that in append mode with no watermark, where the
    // raw interval theta-join would not plan as a streaming hash join
    val dims = Seq((1, 0.0, 10.0), (2, 5.0, 20.0)).toDF("band_id", "lo", "hi")
    val in = MemoryStream[(Long, Double)](96, spark, None)
    val q = Joins.rangeLookup(in.toDF().toDF("fact_id", "pt"),
        dims, "pt", "lo", "hi", binWidth = 4.0)
      .select("fact_id", "band_id")
      .writeStream.format("memory").queryName("range_serve")
      .outputMode("append").start()
    try {
      in.addData((1L, 3.0), (2L, 7.0), (3L, 25.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("range_serve")
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 1), (2L, 1), (2L, 2))) // 3.0→band1, 7.0→both, 25→none
  }

  test("connect via per-side map + union (HandlingMultipleStreams.scala:288-305)") {
    val carts = Seq(("Bob", 2)).toDF("user_id", "qty")
    val views = Seq(("Alice", "p1"), ("Bob", "p2")).toDF("user_id", "product")
    val got = Joins.coMap(
        carts, _.selectExpr("user_id", "'cart' AS src"),
        views, _.selectExpr("user_id", "'view' AS src"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("Bob", "cart"), ("Alice", "view"), ("Bob", "view")))
  }
}
