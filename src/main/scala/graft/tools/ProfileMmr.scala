package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for q_mmr (measurement scratch). */
object ProfileMmr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val queries = Seq((0L, "spark shuffle partitions"),
      (1L, "tokenizer vocabulary merge"), (2L, "gradient checkpoint memory"))
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val docs = graft.Tables.documents(spark, sfDir)
      val run = t("denseTopKAll build+run") {
        val r = graft.ops.Retrieval.denseTopKAll(docs,
          queries.toDF("query_id", "query"), k = 10)
        r.collect(); r
      }
      val vecs = t("hashEmbed run") {
        val v = graft.ops.TextAnalysis.hashEmbed(docs, 64)
        v.write.format("noop").mode("overwrite").save(); v
      }
      t("mmrRerank after inputs") {
        graft.ops.Retrieval.mmrRerank(run, vecs, m = 5, lambda = 0.7)
          .collect()
      }
      t("full q_mmr") {
        graft.ops.Retrieval.mmrRerank(
          graft.ops.Retrieval.denseTopKAll(docs,
            queries.toDF("query_id", "query"), k = 10),
          graft.ops.TextAnalysis.hashEmbed(docs, 64), m = 5, lambda = 0.7)
          .collect()
      }
    }
    spark.stop()
  }
}
