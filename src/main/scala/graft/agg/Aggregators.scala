package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY.md §2.4 A5): Flink's
  * `AggregateFunction[IN, ACC, OUT]` (reference Windows.scala:165-180) maps
  * 1:1 onto Spark's `Aggregator[IN, BUF, OUT]`:
  * createAccumulator→zero, add→reduce, merge→merge, getResult→finish.
  * `merge` exists for exactly the reason the reference narrates
  * (reference Windows.scala:173-176: "aggregation from multiple parallel
  * computations") — Spark calls it to combine map-side partial buffers, so
  * these aggregators scale as partial+final HashAggregate.
  */
object Aggregators {

  /** The reference's `CountAggregate` (reference Windows.scala:165-180). */
  class CountAggregator[IN] extends Aggregator[IN, Long, Long] {
    override def zero: Long = 0L                            // createAccumulator
    override def reduce(acc: Long, in: IN): Long = acc + 1  // add
    override def merge(a: Long, b: Long): Long = a + b      // merge
    override def finish(acc: Long): Long = acc              // getResult
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Numerically-safe mean via (sum, count) buffer — the canonical
    * non-trivial ACC≠OUT shape.
    */
  class MeanAggregator[IN](f: IN => Double) extends Aggregator[IN, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(acc: (Double, Long), in: IN): (Double, Long) =
      (acc._1 + f(in), acc._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(acc: (Double, Long)): Double =
      if (acc._2 == 0) Double.NaN else acc._1 / acc._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Space-Saving frequent-items sketch (Metwally et al.; merge rule from
    * Agarwal et al., "Mergeable Summaries"): at most `k` (item, est, err)
    * entries of state no matter how many distinct items stream through —
    * the fixed-memory scale path for heavy hitters, next to HLL
    * (distincts) and the quantile sketch. Guarantees, preserved under
    * partial+final merge: every item with true count > N/k is present,
    * and for present items est − err ≤ true ≤ est. The exact
    * threshold form ([[graft.ops.TextAnalysis.heavyHitters]], oracled as
    * q_heavy_hitters) is the small-scale twin this sketch is validated
    * against in SketchSpec.
    *
    * State is a k-entry map: reduce is O(1) for tracked items, but every
    * UNSEEN item once the map is full pays an O(k) min-scan eviction — on
    * a heavy-tailed stream that is most items past the head, so worst
    * case is O(N·k) long-comparisons. At the k this library targets
    * (tens-to-thousands) that is executor-trivial next to tokenization;
    * a corpus needing k in the millions wants the Stream-Summary
    * bucket-list structure instead (O(1) eviction) — documented here so
    * nobody scales k by 1000× on this implementation unawares.
    */
  class SpaceSavingAggregator(k: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(acc: Map[String, (Long, Long)],
        item: String): Map[String, (Long, Long)] =
      acc.get(item) match {
        case Some((c, e)) => acc.updated(item, (c + 1, e))
        case None if acc.size < k => acc.updated(item, (1L, 0L))
        case None =>
          // evict the min-estimate entry (key tiebreak for determinism);
          // the newcomer inherits its count as the overestimate error
          val (evicted, (minC, _)) = acc.minBy { case (i, (c, _)) => (c, i) }
          (acc - evicted).updated(item, (minC + 1, minC))
      }

    /** An item absent from a FULL sketch has true count ≤ the sketch's
      * minimum estimate; absent from an under-full sketch, exactly 0.
      */
    private def floor(m: Map[String, (Long, Long)]): Long =
      if (m.size < k) 0L else m.values.iterator.map(_._1).min

    override def merge(a: Map[String, (Long, Long)],
        b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      val fa = floor(a)
      val fb = floor(b)
      val combined = (a.keySet ++ b.keySet).iterator.map { item =>
        val (ca, ea) = a.getOrElse(item, (fa, fa))
        val (cb, eb) = b.getOrElse(item, (fb, fb))
        item -> ((ca + cb, ea + eb))
      }.toMap
      if (combined.size <= k) combined
      else combined.toSeq
        .sortBy { case (i, (c, _)) => (-c, i) }.take(k).toMap
    }

    /** Entries sorted by estimate desc (key tiebreak): (item, est, err). */
    override def finish(acc: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
      acc.toSeq.map { case (i, (c, e)) => (i, c, e) }
        .sortBy { case (i, c, _) => (-c, i) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      Encoders.kryo[Map[String, (Long, Long)]]
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      Encoders.kryo[Seq[(String, Long, Long)]]
  }
}
