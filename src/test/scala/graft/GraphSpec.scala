package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("transitionEdges: per-user consecutive pairs, weighted, tie-ordered") {
    val ev = Seq(
      // u1: a -> b -> a (ts order), u2: b -> c, u3: single event (no edge)
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "a"),
      (4L, 10L, 2L, "b"), (5L, 20L, 2L, "c"),
      (6L, 10L, 3L, "z"),
      // u4: same-ts tie broken by event_id: a -> b
      (7L, 40L, 4L, "a"), (8L, 40L, 4L, "b")
    ).toDF("event_id", "ts", "user_id", "page")
    val got = Graph.transitionEdges(ev, "page", "user_id", "ts", "event_id")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
  }

  test("pageRank equals a sequential reference (dangling mass included)") {
    // a -> b twice, a -> c once, c -> a once; b is DANGLING — its mass
    // must be redistributed, not dropped (sum(rank) stays 1)
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "weight")
    val iters = 3
    val d = 0.85
    val got = Graph.pageRank(edges, iters, d)
      .as[(String, Double)].collect().toMap
    // independent reference: dense synchronous updates
    val nodes = Seq("a", "b", "c")
    val n = nodes.length
    val share = Map(("a", "b") -> 2.0 / 3, ("a", "c") -> 1.0 / 3,
      ("c", "a") -> 1.0)
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = r("b") // only b has no out-edges
      r = nodes.map { v =>
        val in = share.collect { case ((u, w), s) if w == v => r(u) * s }.sum
        v -> ((1 - d) / n + d * (in + dang / n))
      }.toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-6, s"$v: ${got(v)} vs ${r(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-5, got)
  }

  test("pageRank: symmetric 2-cycle stays uniform at every iteration") {
    val edges = Seq(("x", "y", 1L), ("y", "x", 1L)).toDF("src", "dst", "weight")
    val got = Graph.pageRank(edges, iterations = 4).as[(String, Double)]
      .collect().toMap
    assert(got == Map("x" -> 0.5, "y" -> 0.5), got)
  }

  test("randomProject matches the md5-parity formula and preserves cosine") {
    import graft.ops.Similarity
    val emb = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i + 1).toFloat)),
      (1L, Array.tabulate(64)(i => math.sin(i + 1).toFloat * 2f)), // colinear
      (2L, Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat))
    ).toDF("vec_id", "embedding")
    val got = Similarity.randomProject(emb, 64, 16)
      .as[(Long, Seq[Double])].collect().toMap
    // plain-Scala replay of the kernel's matrix formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val h = md.digest(s"rp-$i-$j".getBytes("UTF-8")); md.reset()
      val hex = (h(0) >> 4) & 0xf
      (if (hex % 2 == 0) 1.0 else -1.0) / math.sqrt(16.0)
    }
    val v0 = Array.tabulate(64)(i => math.sin(i + 1))
    val exp0 = Array.tabulate(16)(j =>
      (0 until 64).map(i => v0(i).toFloat.toDouble * sign(i, j)).sum)
    got(0L).zip(exp0).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"$g vs $e")
    }
    // colinear inputs stay colinear (cosine exactly 1 under any linear map)
    val c01 = got(0L).zip(got(1L)).map { case (a, b) => a * b }.sum /
      (math.sqrt(got(0L).map(x => x * x).sum) *
        math.sqrt(got(1L).map(x => x * x).sum))
    assert(math.abs(c01 - 1.0) < 1e-9, c01.toString)
  }
}
