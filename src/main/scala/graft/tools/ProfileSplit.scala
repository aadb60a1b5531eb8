package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement tool (guide §1: measure first).
  *
  * For every declared query, split wall time into
  *   - build: `fn(spark, sfDir)` — DataFrame construction, including any eager
  *     driver-side work hidden in construction (collects, bloom builds, pins);
  *   - plan: forcing `queryExecution.executedPlan` (analysis + optimization +
  *     physical planning, AQE initial plan);
  *   - exec: the Bench.exercise action (xxhash64-fold over all columns);
  * plus scheduler counters (jobs / stages / tasks launched by the exec) and
  * the number of Exchange nodes in the executed plan string.
  *
  * Methodology matches Bench: warmup pass, then `passes` timed passes, median.
  * Output: TSV to stdout, one row per query.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileSplit /root/testdata/sf0.1 [passes] [q1,q2,...]"
  */
object ProfileSplit {
  private def exercise(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  private def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val only: Set[String] = if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })

    val queries = (graft.SparkEntry.queries - "q_nn").toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }

    // warmup
    queries.foreach { case (_, fn) =>
      try exercise(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    val rows = queries.flatMap { case (name, fn) =>
      try {
        val bs = Array.fill(passes)(0.0); val ps = Array.fill(passes)(0.0)
        val es = Array.fill(passes)(0.0)
        var (j0, s0, t0c) = (0, 0, 0)
        for (p <- 0 until passes) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          jobs = 0; stages = 0; tasks = 0
          exercise(df)
          val t3 = System.nanoTime()
          // listener events are async; tiny settle for counter accuracy
          Thread.sleep(30)
          bs(p) = (t1 - t0) / 1e9; ps(p) = (t2 - t1) / 1e9; es(p) = (t3 - t2) / 1e9
          if (p == passes - 1) { j0 = jobs; s0 = stages; t0c = tasks }
        }
        val planStr = fn(spark, sfDir).queryExecution.executedPlan.toString
        val nEx = "Exchange".r.findAllIn(planStr).length
        Some((name, median(bs.toSeq), median(ps.toSeq), median(es.toSeq), j0, s0, t0c, nEx))
      } catch { case e: Throwable =>
        System.err.println(s"[profile] $name failed: ${e.getMessage}"); None
      }
    }

    println("query\tbuild\tplan\texec\ttotal\tjobs\tstages\ttasks\texchanges")
    rows.sortBy(-_._4).foreach { case (n, b, p, e, j, s, t, x) =>
      println(f"$n\t$b%.3f\t$p%.3f\t$e%.3f\t${b + p + e}%.3f\t$j\t$s\t$t\t$x")
    }
    val (tb, tp, te) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    println(f"TOTALS\t$tb%.1f\t$tp%.1f\t$te%.1f\t${tb + tp + te}%.1f")
    spark.stop()
  }
}
