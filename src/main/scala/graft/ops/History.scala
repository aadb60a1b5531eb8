package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing attribute history (SCD type 2) over a change stream —
  * the snapshot-versioning layer of a corpus pipeline: "what was this
  * document's (license, domain label, quality tier) in the March crawl?",
  * "which dedup decision was live when shard 17 was packed?". The same
  * algebra serves user/state timelines over event streams.
  *
  * Everything is per-key window algebra on the change stream itself — no
  * driver state, no iteration. The key is high-cardinality (doc id, user
  * id), so the per-key windows hash-distribute; both windows share one
  * (key)-exchange and one (key, ts, ord) sort (Catalyst reuses the first
  * window's ordering for the second — verified in the plan).
  */
object History {

  /** Collapse a change stream into SCD2 version rows: one row per (key,
    * run of equal values in (ts, ord) order), with
    * `[valid_from, valid_to)` bounds, a per-key version number, and an
    * `is_current` flag on the open-ended run. Re-stating the same value
    * does NOT open a new version (the lag filter drops consecutive
    * duplicates) — the standard SCD2 contract.
    *
    * `ordCol` breaks same-timestamp ties deterministically (two changes
    * in one instant produce an empty-interval version row for the loser
    * — retained, so the audit trail is lossless). Null values are a real
    * state (null-safe comparison): a key can version from x → null → x,
    * producing three rows.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val runs = changes
      .select(col(keyCol), col(tsCol), col(ordCol), col(valueCol))
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      // keep run openers: the first change per key, and every change whose
      // value differs (null-safely) from its predecessor
      .where(col("_rn") === 1 || !(col(valueCol) <=> col("_prev")))
    runs
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"),
        col(valueCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Point-in-time snapshot of an [[scd2]] history: the state of every
    * key live at `ts` (half-open intervals: a version starting exactly at
    * `ts` is live, one ending at `ts` is not). Keys whose first version
    * opens after `ts` are absent — they did not exist yet. A pushed-down
    * range filter on the history table; with the history written
    * range-clustered by valid_from this prunes whole files at scale.
    */
  def asOf(history: DataFrame, keyCol: String, ts: Column): DataFrame =
    history
      .where(col("valid_from") <= ts &&
        (col("valid_to").isNull || col("valid_to") > ts))
      .select(col(keyCol), col("version"), col("state"))
}
