package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** The distributed prefix-sum machinery shared by the exact-percentile
  * profiler ([[Contracts.exactColumnStats]]) and the classifier-eval
  * score dictionary (TextAnalysis.scoreDictCum): a global cumulative
  * sum over a distinct-value DICTIONARY ordered by a double-valued key,
  * computed without ever forming one unpartitioned window —
  * approx_percentile range-buckets the keys monotonically, the running
  * sum windows within each bucket, and the per-bucket totals collect
  * driver-side into broadcast offsets.
  *
  * The bucket fan-out is ADAPTIVE (round-11): it grows with the
  * dictionary so a 100×-scale near-all-distinct column never puts a
  * corpus-shaped share of the dictionary through one window partition,
  * and stays capped so the per-bucket totals remain an offset-sized
  * driver collect.
  */
private[graft] object PrefixSum {

  /** Bucket count for a dictionary of `dictRows` distinct values: the
    * historic floor of 64, then one extra bucket per ~250k dictionary
    * rows (so a window partition tops out around 250k rows — well
    * inside executor memory even with the carried count columns),
    * capped at 4096 (per-bucket totals stay a ≤4096-row driver collect
    * and the quantile probe stays resolvable).
    */
  def parts(dictRows: Long): Int =
    math.min(4096L, math.max(64L, dictRows / 250000L + 1L)).toInt

  /** Adds, for each `(cntCol, outCol)` pair, the INCLUSIVE global
    * running sum of `cntCol` over ascending `valueCol` (a double-typed
    * dictionary key). Ties in `valueCol` cannot exist UNLESS `tieCol`
    * is given: callers pass a groupBy dictionary, but a double CAST of
    * an exact key can collide past 2^53 — supply the original exact
    * column as `tieCol` and the within-bucket window orders by
    * (valueCol, tieCol), keeping the running sum deterministic and in
    * true key order (the cast is monotone, so colliding keys always
    * share a range bucket and never interleave across buckets). Sums
    * are computed in double (counts below 2^53 stay exact). Original
    * columns are preserved; the machinery's internals are dropped. The
    * input should be localCheckpoint'd by the caller — this runs a
    * count job plus a quantile-probe job plus the totals job over it.
    */
  def cumulative(dict: DataFrame, valueCol: String,
      cnts: Seq[(String, String)],
      tieCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cnts.nonEmpty, "PrefixSum.cumulative: need at least one count column")
    val v = col(valueCol)
    val nParts = parts(dict.count())
    val probs = (1 until nParts).map(_.toDouble / nParts)
    val accuracy = math.max(10000, nParts * 4)
    val boundsRow = dict.agg(
      percentile_approx(v, lit(probs.toArray), lit(accuracy)).as("b")).head()
    val bounds =
      if (boundsRow.isNullAt(0)) Array.empty[Double]
      else boundsRow.getSeq[Double](0).distinct.sorted.toArray
    // bucket(s) = #{bound < s}: monotone in the key, so offset +
    // within-bucket running sum ≡ the global cumulative sum exactly
    val parted = dict.withColumn("_part",
      size(filter(lit(bounds), b => b < v)))
    val totAggs = cnts.map { case (c, _) =>
      sum(col(c).cast("double")).as(s"_t_$c") }
    val totals = parted.groupBy("_part")
      .agg(totAggs.head, totAggs.tail: _*).collect()
      .map(r => (r.getInt(0),
        cnts.indices.map(i => r.getDouble(i + 1)).toArray))
      .sortBy(_._1)
    val offs = cnts.indices.map { i =>
      totals.scanLeft(0.0)((a, t) => a + t._2(i)).init
    }
    val schema = StructType(StructField("_part", IntegerType) +:
      cnts.map { case (c, _) => StructField(s"_off_$c", DoubleType) })
    val offRows = totals.indices.map { r =>
      Row.fromSeq(totals(r)._1 +: cnts.indices.map(i => offs(i)(r)))
    }
    import scala.jdk.CollectionConverters._
    val offDf = dict.sparkSession.createDataFrame(offRows.asJava, schema)
    val w = Window.partitionBy(col("_part"))
      .orderBy(v +: tieCol.map(col).toSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withW = cnts.foldLeft(parted) { case (d, (c, _)) =>
      d.withColumn(s"_w_$c", sum(col(c).cast("double")).over(w)) }
    val joined = withW.join(broadcast(offDf), Seq("_part"))
    val withOut = cnts.foldLeft(joined) { case (d, (c, out)) =>
      d.withColumn(out, col(s"_off_$c") + col(s"_w_$c")) }
    withOut.drop("_part" +: cnts.flatMap { case (c, _) =>
      Seq(s"_off_$c", s"_w_$c") }: _*)
  }
}
