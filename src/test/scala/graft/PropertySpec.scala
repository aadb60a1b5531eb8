package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{Joins, Windowing}

/** Property-based invariants (SURVEY.md §5): window-count conservation,
  * sliding multiplicity, union cardinality, interval-join symmetry —
  * checked over randomized event sets via ScalaCheck.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // events: (key, seconds offset in [0, 120))
  private val eventsGen: Gen[List[(String, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 119)))

  private def toDf(evs: List[(String, Int)]) =
    evs.map { case (k, s) => (k, new Timestamp(s * 1000L)) }.toDF("k", "ts")

  test("tumbling windows conserve the event count") {
    check(Prop.forAll(eventsGen) { evs =>
      evs.isEmpty || {
        val total = Windowing.tumblingCount(toDf(evs), "ts", "7 seconds")
          .agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].head()
        total == evs.size
      }
    })
  }

  test("sliding windows hold each event exactly size/slide times") {
    check(Prop.forAll(eventsGen) { evs =>
      evs.isEmpty || {
        val total = Windowing.slidingCount(toDf(evs), "ts", "12 seconds", "3 seconds")
          .agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].head()
        total == evs.size * 4L
      }
    })
  }

  test("union cardinality is additive") {
    check(Prop.forAll(eventsGen, eventsGen) { (e1, e2) =>
      toDf(e1).union(toDf(e2)).count() == (e1.size + e2.size).toLong
    })
  }

  test("interval join is symmetric under side swap") {
    check(Prop.forAll(eventsGen, eventsGen) { (e1, e2) =>
      val a = toDf(e1).withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
      val b = toDf(e2).withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id() + 1000000)
      val ab = Joins.intervalJoin(a, b, "k", "ts", "id", "5 SECONDS")
        .as[(Long, Long)].collect().toSet
      val ba = Joins.intervalJoin(b, a, "k", "ts", "id", "5 SECONDS")
        .as[(Long, Long)].collect().map(_.swap).toSet
      ab == ba
    })
  }
}
