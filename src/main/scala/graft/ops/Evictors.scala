package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evictor + batch analogues of keyed state (SURVEY.md §2.7 G6, §2.10 X2/X3).
  *
  * Flink's `MyCountEvictor` (keep last N per window) becomes a rank-filter
  * over a Spark window function — one shuffle on the partition key, no
  * per-element state. ListState/MapState batch analogues are collect_list /
  * per-(key,field) counts; the streaming stateful twins live in
  * graft.streaming.Stateful.
  */
object Evictors {

  /** Keep the most recent `n` rows per key (G6,
    * reference TriggersAndEvictors.scala:245-290). Deterministic tie-break on
    * `idCol` so results are stable across engines and runs.
    * Scale: `row_number` needs a per-key sort, but partial top-n pushdown
    * (rank limit) keeps state bounded; skewed keys are handled by AQE.
    */
  def keepLastN(df: DataFrame, key: String, tsCol: String, idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol).desc, col(idCol).desc)
    df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .select(col(key), col(idCol), col("rn"))
  }

  /** General top-N per key by an arbitrary ordering column — the
    * rank-filter generalization of [[keepLastN]] (and the distributed form
    * of the reference's driver-side `maxBy`, reference Windows.scala:390).
    * Spark plans a per-key partial top-N (WindowGroupLimit pushdown) before
    * the shuffle, so state per partition is O(keys × n).
    */
  def topNPerKey(df: DataFrame, key: String, orderCol: String, idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .select(col(key), col(idCol), col(orderCol), col("rn"))
  }

  /** Windowed count with a count-evictor in BOTH of Flink's eviction
    * positions (reference TriggersAndEvictors.scala:245-290, MyCountEvictor
    * with its `runBefore` flag):
    *   - `evictBefore = true`: all but the last `maxSize` elements are
    *     removed BEFORE the window function runs, so the fired result
    *     counts survivors only — the reference's golden output keeps 3 per
    *     window ("(TimeWindow{...},3)").
    *   - `evictBefore = false`: the window function sees every element and
    *     eviction happens AFTER it — at the terminal fire of each window
    *     (the batch analogue of window close) eviction is then unobservable
    *     in the output, exactly Flink's semantics.
    * Eviction order is oldest-first (the reference walks the iterator from
    * the head); `idCol` breaks timestamp ties deterministically.
    */
  def windowCountWithEvictor(df: DataFrame, tsCol: String, idCol: String,
      winDur: String, maxSize: Int, evictBefore: Boolean): DataFrame = {
    val win = window(col(tsCol), winDur)
    val rows = df.select(col(tsCol), col(idCol),
      win.getField("start").as("w_start"), win.getField("end").as("w_end"))
    val survivors =
      if (!evictBefore) rows
      else {
        val w = Window.partitionBy(col("w_start"))
          .orderBy(col(tsCol).desc, col(idCol).desc)
        rows.withColumn("rn", row_number().over(w)).where(col("rn") <= maxSize)
      }
    survivors.groupBy("w_start", "w_end").agg(count(lit(1)).as("cnt"))
  }

  /** ListState batch analogue (X2, reference KeyedState.scala:159-193):
    * accumulate all element ids per key. Emitted as a sorted comma-joined
    * string — deterministic and engine-portable (array ordering from
    * collect_list is not).
    */
  def listStatePerKey(df: DataFrame, key: String, idCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(array_join(sort_array(collect_list(col(idCol))).cast("array<string>"), ",")
        .as("ids"))

  /** MapState batch analogue (X3/A8, reference KeyedState.scala:225-256,
    * 391-439): per-key per-event-type counters. The map shape
    * (`Map[String, Long]` per key) flattens to (key, field, count) rows —
    * the relational normal form of MapState.
    */
  def mapStatePerKey(df: DataFrame, key: String, field: String): DataFrame =
    df.groupBy(col(key), col(field)).count().withColumnRenamed("count", "cnt")
}
