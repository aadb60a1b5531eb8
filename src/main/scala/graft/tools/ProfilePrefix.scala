package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing inside exactProfileStats (measurement scratch):
  * dictionary build vs prefix-sum rank lookup.
  */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (p <- 1 to 3) {
      println(s"--- pass $p")
      val entries = cols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("_i"), expr(s"try_cast(`$c` AS DOUBLE)").as("_d")) }
      val dictD = t("dictD checkpoint") {
        li.select(explode(array(entries: _*)).as("e"))
          .select(col("e._i").as("_i"), col("e._d").as("_d"))
          .where(col("_d").isNotNull)
          .groupBy("_i", "_d").agg(count(lit(1)).as("_c"))
          .localCheckpoint()
      }
      val nRows = t("nRows collect") {
        dictD.groupBy("_i").agg(sum("_c").as("_n"), count(lit(1)).as("_rows"))
          .collect()
      }
      println("  dict sizes: " +
        nRows.map(r => r.getInt(0) + ":" + r.getLong(2)).mkString(" "))
      val ns = nRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ranksOf = cols.indices.map { i =>
        val n = ns.getOrElse(i, 0L)
        if (n == 0L) Seq.empty[Long]
        else Seq(0.5, 0.95).map(p => p * (n - 1).toDouble)
          .flatMap(r => Seq(math.floor(r).toLong, math.ceil(r).toLong))
          .distinct
      }
      val cum = t("cumulative() build (bounds+totals)") {
        graft.ops.PrefixSum.cumulative(dictD, "_d",
          Seq("_c" -> "_cum"), byCol = Some("_i"),
          dictRows = Some(nRows.map(_.getLong(2)).sum))
      }
      val rankArr = cols.indices.foldLeft(lit(Array.empty[Long])) { (acc, i) =>
        when(col("_i") === i, lit(ranksOf(i).toArray)).otherwise(acc)
      }
      val hits = t("cum+rank-filter collect") {
        cum.select(col("_i"), col("_d"), col("_cum"), col("_c"))
          .withColumn("_k", explode(filter(rankArr,
            k => col("_cum") > k && (col("_cum") - col("_c")) <= k)))
          .select(col("_i"), col("_k"), col("_d")).collect()
      }
      println("  hit rows: " + hits.length)
    }
    spark.stop()
  }
}
