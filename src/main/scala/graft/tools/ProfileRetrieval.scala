package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for the Retrieval batch-eval family (measurement
  * scratch): q_retrieval_eval / q_ndcg / q_rm3 and their shared
  * bm25TopKAll internals.
  */
object ProfileRetrieval {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    import graft.ops.{Retrieval, Core}
    val name = "profret1"
    val idx = t("postingsIndex build/reg") {
      Retrieval.postingsIndex(docs, name)
    }
    val stats = t("corpusStats build/reg") {
      Retrieval.corpusStats(docs, name)
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val qd = docs.where(col("doc_id") % 25 === 0)
      val qt = t("qt tokenize+collect rows") {
        val q = qd.select(col("doc_id").cast("long").as("query_id"),
          array_join(slice(Core.tokensUni(col("text")), 1, 5), " ")
            .as("query"))
          .where(length(col("query")) > 0)
        val n = q.count()
        println(s"    n_queries=$n")
        q
      }
      t("  distinct terms collect") {
        val terms = qt.select(col("query_id"),
          explode(array_distinct(Core.tokensUni(col("query")))).as("token"))
          .select("token").distinct().collect()
        println(s"    n_terms=${terms.length}")
      }
      t("bm25TopKAll full") {
        Retrieval.bm25TopKAll(idx, stats, qt, k = 10)
          .write.format("noop").mode("overwrite").save()
      }
      t("q_retrieval_eval full") {
        Retrieval.knownItemEval(idx, stats, qd, k = 10, queryTokens = 5)
          .collect()
      }
      t("q_ndcg-ish full") {
        val qrels = qd.select(col("doc_id").as("query_id"))
          .select(col("query_id"), explode(array(
            struct(col("query_id").as("doc_id"), lit(3).as("rel")),
            struct((col("query_id") + 1).as("doc_id"), lit(2).as("rel")),
            struct((col("query_id") + 2).as("doc_id"), lit(1).as("rel"))))
            .as("qr"))
          .select(col("query_id"), col("qr.doc_id").as("doc_id"),
            col("qr.rel").as("rel"))
          .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
        Retrieval.ndcgAtK(idx, stats, qd, qrels, k = 10, queryTokens = 5)
          .write.format("noop").mode("overwrite").save()
      }
      t("q_rm3-ish full") {
        import spark.implicits._
        Retrieval.rm3Expand(idx, stats,
          Seq((0L, "spark shuffle partitions"),
            (1L, "tokenizer vocabulary merge"),
            (2L, "gradient checkpoint memory")).toDF("query_id", "query"),
          k = 10, fbDocs = 5, fbTerms = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
