package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing (SURVEY.md §2.5–2.6).
  *
  * Tumbling/sliding/session windows re-expressed with Catalyst's native
  * `window()` / `session_window()` expressions — the `TimeWindow` rewrite
  * turns these into plain projections + hash aggregation, so a windowed
  * count at 100 TB is one shuffle on (window, key) with map-side partials.
  * The streaming twins (withWatermark + the same expressions) live in
  * graft.streaming; semantics are identical by construction.
  */
object Windowing {

  /** Keyed tumbling event-time window count (W1/A6/M1,
    * reference Windows.scala:84-86, 197-203). Window bounds are surfaced as
    * `w_start`/`w_end` — the analogue of Flink's `context.window` metadata
    * (W6, reference Windows.scala:129,150).
    */
  def tumblingCount(df: DataFrame, tsCol: String, size: String, keys: Column*): DataFrame =
    df.groupBy((window(col(tsCol), size) +: keys): _*)
      .count()
      .select((Seq(col("window.start").as("w_start"), col("window.end").as("w_end")) ++
        keys :+ col("count").as("cnt")): _*)

  /** Sliding event-time window count (W2, reference Windows.scala:244-247).
    * Each event lands in size/slide windows; Catalyst expands that with a
    * Generator (no self-join), then one hash aggregation.
    */
  def slidingCount(df: DataFrame, tsCol: String, size: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), size, slide))
      .count()
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("count").as("cnt"))

  /** Keyed session window with gap (W3,
    * reference Windows.scala:317-323,330-338): native `session_window`
    * (Spark ≥3.2) — start = first event, end = last event + gap, merged
    * while gaps < gap. Partitioned by key → scales as one shuffle.
    */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String, key: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(key))
      .count()
      .select(col(key), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("count").as("cnt"))

  /** "Window with the most events" — the reference's top-k exercise (W7,
    * reference Windows.scala:367-391: slide → count → driver-side maxBy).
    * Here the argmax stays distributed: TakeOrderedAndProject (no full sort)
    * with a deterministic tie-break on window start.
    */
  def busiestWindow(df: DataFrame, tsCol: String, size: String, slide: String,
      pred: Column): DataFrame =
    df.where(pred)
      .groupBy(window(col(tsCol), size, slide))
      .count()
      .select(col("window.start").as("w_start"), col("count").as("cnt"))
      .orderBy(col("cnt").desc, col("w_start").asc)
      .limit(1)
}
