package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Offline recall/latency measurement for the ANN configurations — the
  * evidence behind the q_nn_lsh default (multi-probe vs multi-table).
  * Run: sbt "runMain graft.tools.MeasureLsh /root/testdata/sf0.1"
  */
object MeasureLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    println(s"N=${emb.count()}")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"$label%-20s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val exactRows = timed("exact")(Similarity.nearestNeighbour(emb).collect())
    val exact = exactRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the subset whose true NN is actually near: what similarity/dedup
    // pipelines act on, and the honest recall target for bucketed ANN on
    // quasi-orthogonal data (an LSH bucket cannot "find" a neighbour at
    // ~90° — no bucketing scheme can)
    val nearIds = exactRows.filter(_.getDouble(2) >= 0.6).map(_.getLong(0)).toSet
    println(s"near(cos>=0.6)=${nearIds.size}/${exact.size}")
    for ((label, np, nt, mp) <- Seq(
        ("p6,4tables", 6, 4, false), ("p6,1table+mp", 6, 1, true),
        ("p6,2tables+mp", 6, 2, true), ("p6,4tables+mp", 6, 4, true),
        ("p4,2tables+mp", 4, 2, true), ("p4,4tables+mp", 4, 4, true))) {
      val approx = timed(label)(
        Similarity.lshNearestNeighbour(emb, dim = 64, numPlanes = np,
          numTables = nt, multiProbe = mp)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      val hits = exact.keys.count(id => approx.get(id).contains(exact(id)))
      val nearHits = nearIds.count(id => approx.get(id).contains(exact(id)))
      println(f"$label%-20s recall=${hits.toDouble / exact.size}%.4f " +
        f"recall@near=${if (nearIds.isEmpty) 1.0 else nearHits.toDouble / nearIds.size}%.4f " +
        s"coverage=${approx.size}/${exact.size}")
    }
    spark.stop()
  }
}
