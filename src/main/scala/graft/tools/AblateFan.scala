package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-query fan-out ablation (guide §1 empirical loop): for every declared
  * query, time build+exec (the Bench-shaped action) with Par.fanOut forced
  * OFF and ON in the same JVM — warm, median of `passes` — and print the
  * delta. The output decides the final call-site list empirically.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AblateFan /root/testdata/sf0.1 [passes] [q1,q2,...]"
  */
object AblateFan {
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

    val queries = (graft.SparkEntry.queries - "q_nn").toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }

    // global warmup (indexes, codegen) in both modes
    graft.ops.Par.forceOff = true
    queries.foreach { case (_, fn) =>
      try exercise(fn(spark, sfDir)) catch { case _: Throwable => () } }
    graft.ops.Par.forceOff = false
    queries.foreach { case (_, fn) =>
      try exercise(fn(spark, sfDir)) catch { case _: Throwable => () } }

    def timeOne(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      exercise(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }

    println("query\toff\ton\tdelta")
    var (sOff, sOn) = (0.0, 0.0)
    queries.foreach { case (name, fn) =>
      try {
        // interleave OFF/ON per pass so host drift lands on both sides
        val off = Array.fill(passes)(0.0); val on = Array.fill(passes)(0.0)
        for (p <- 0 until passes) {
          spark.catalog.clearCache()
          graft.ops.Par.forceOff = true
          off(p) = timeOne(fn)
          graft.ops.Par.forceOff = false
          on(p) = timeOne(fn)
        }
        val (mo, mn) = (median(off.toIndexedSeq), median(on.toIndexedSeq))
        sOff += mo; sOn += mn
        println(f"$name\t$mo%.3f\t$mn%.3f\t${mn - mo}%+.3f")
      } catch { case e: Throwable =>
        System.err.println(s"[ablate] $name failed: ${e.getMessage}")
      }
    }
    println(f"TOTALS\t$sOff%.1f\t$sOn%.1f\t${sOn - sOff}%+.1f")
    spark.stop()
  }
}
