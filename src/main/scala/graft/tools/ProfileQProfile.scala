package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for q_profile (measurement scratch, not shipped
  * behavior): wide agg alone, exact chain alone, full tableProfile.
  */
object ProfileQProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val li = graft.Tables.lineitem(spark, sfDir)
      t("scan count") { li.count() }
      t("wide agg only") {
        val aggs = cols.flatMap { c =>
          val d = col(c).cast("double")
          Seq(count(col(c)), sum(col(c).isNull.cast("long")),
            round(min(d), 4), round(max(d), 4), round(avg(d), 4),
            round(stddev_samp(d), 4))
        }
        li.agg(aggs.head, aggs.tail: _*).collect()
      }
      t("countDistinct agg") {
        li.agg(countDistinct(col(cols.head)),
          cols.tail.map(c => countDistinct(col(c))): _*).collect()
      }
      t("exactProfileStats") {
        graft.ops.Contracts.exactProfileStats(li, cols, Seq(0.5, 0.95))
      }
      t("full tableProfile") {
        graft.ops.Contracts.tableProfile(li, cols).collect()
      }
    }
    spark.stop()
  }
}
