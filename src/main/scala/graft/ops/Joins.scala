package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-stream operators: union, window join, interval join
  * (SURVEY.md §2.8; reference HandlingMultipleStreams.scala).
  *
  * Scale notes: the window join co-buckets both sides on (key, bucket) so the
  * equi-join shuffles each side exactly once; the interval join is an
  * equi-join on the key with the time range as a post-join predicate — at
  * 100 TB the key equi-condition is what keeps it a hash/sort-merge join
  * rather than a cartesian. Dimension-sized sides should be wrapped in
  * `broadcast()` by the caller (Catalyst + AQE also auto-detect).
  */
object Joins {

  /** `a.union(b)` — same-typed merge, no order guarantee (J1,
    * reference HandlingMultipleStreams.scala:49-85). Union is a zero-shuffle
    * plan node; any downstream agg shuffles once.
    */
  def unionCounts(a: DataFrame, b: DataFrame, key: String): DataFrame =
    // by name, not position: positional union silently mis-associates
    // columns when the two sides list the same fields in different order
    a.unionByName(b).groupBy(col(key)).count().withColumnRenamed("count", "cnt")

  /** Windowed equi-join (J2, reference HandlingMultipleStreams.scala:87-129):
    * pairs of events from both sides with the same key inside the same
    * tumbling window. Both sides are bucketed by `window()` *before* the
    * join, so the join keys are (key, bucket) — a plain shuffle-hash /
    * sort-merge equi-join, exactly Flink's co-windowed join semantics.
    */
  def windowJoinCount(a: DataFrame, b: DataFrame, key: String, tsCol: String,
      size: String): DataFrame = {
    val aw = a.select(col(key).as("k"), window(col(tsCol), size)("start").as("w_start"))
    val bw = b.select(col(key).as("k"), window(col(tsCol), size)("start").as("w_start"))
    aw.join(bw, Seq("k", "w_start"))
      .groupBy(col("w_start"))
      .count().withColumnRenamed("count", "cnt")
  }

  /** Keyed interval join (J3,
    * reference HandlingMultipleStreams.scala:131-210): match a-row with
    * b-rows of the same key where `a.ts − lower < b.ts < a.ts + upper`
    * (exclusive bounds, as `.lowerBoundExclusive().upperBoundExclusive()`).
    * Emits the matched id pair.
    */
  def intervalJoin(a: DataFrame, b: DataFrame, key: String, tsCol: String,
      idCol: String, bound: String): DataFrame = {
    val l = a.select(col(key).as("k"), col(tsCol).as("a_ts"), col(idCol).as("a_id"))
    val r = b.select(col(key).as("k2"), col(tsCol).as("b_ts"), col(idCol).as("b_id"))
    l.join(r,
        col("k") === col("k2") &&
        col("b_ts") > col("a_ts") - expr(s"INTERVAL $bound") &&
        col("b_ts") < col("a_ts") + expr(s"INTERVAL $bound"))
      .select(col("a_id"), col("b_id"))
  }

  /** connect + CoMapFunction (J5/J6,
    * reference HandlingMultipleStreams.scala:288-327): per-side transform to
    * a common shape, then union — the Spark-first decomposition of
    * `ConnectedStreams.map(f, g)`.
    */
  def coMap(a: DataFrame, fa: DataFrame => DataFrame,
      b: DataFrame, fb: DataFrame => DataFrame): DataFrame =
    fa(a).unionByName(fb(b))
}
