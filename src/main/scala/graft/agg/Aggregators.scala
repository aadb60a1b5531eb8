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
}
