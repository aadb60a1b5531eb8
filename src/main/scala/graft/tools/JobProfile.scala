package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query job profile (guide §1 empirical loop): for each declared
  * query, run once warm then measure one pass with a SparkListener —
  * wall seconds, job count, summed job milliseconds, task count, and the
  * top jobs by duration with their task counts. A heavy job with a tiny
  * task count is a starved stage (the batch-4 single-task kernel hunt:
  * q_gopher_rep 1567ms/1t, q_cms 1185ms/1t, q_perm_test 1243ms/1t).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobProfile /root/testdata/sf0.1 [minWallSec] [q1,q2,...]"
  */
object JobProfile {
  private def exercise(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val minWall = if (args.length > 1) args(1).toDouble else 0.0
    val only: Set[String] = if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jl = mutable.ListBuffer[(Long, Int)]()
    val st = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val js = mutable.Map[Int, Long](); val jst = mutable.Map[Int, Seq[Int]]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        js(j.jobId) = j.time; jst(j.jobId) = j.stageIds
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        st(s.stageInfo.stageId) = s.stageInfo.numTasks
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jl.synchronized {
        jl += ((j.time - js.getOrElse(j.jobId, j.time),
          jst.getOrElse(j.jobId, Nil).map(s => st.getOrElse(s, 0)).sum))
      }
    })

    val queries = (graft.SparkEntry.queries - "q_nn").toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    queries.foreach { case (name, fn) =>
      try {
        spark.catalog.clearCache(); exercise(fn(spark, sfDir)) // warm
        spark.catalog.clearCache()
        jl.synchronized(jl.clear())
        val t0 = System.nanoTime(); exercise(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val snap = jl.synchronized(jl.toList)
        if (dt >= minWall) {
          val top = snap.sortBy(-_._1).take(5)
            .map { case (d, n) => s"${d}ms/${n}t" }.mkString(",")
          println(f"PROF $name%-24s wall=$dt%6.3f jobs=${snap.size}%3d " +
            f"jobsum=${snap.map(_._1).sum / 1000.0}%6.3f " +
            f"tasks=${snap.map(_._2).sum}%5d top=$top")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[prof] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
