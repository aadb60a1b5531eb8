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

  /** Fold an append-only batch of changes into a standing [[scd2]]
    * history without revisiting it — the warehouse MERGE step: closed
    * versions are immutable (their [valid_from, valid_to) is sealed by a
    * later change that already exists), so only each key's CURRENT row
    * can change, and the fold is scd2(current rows ∪ new changes)
    * spliced over the closed rows. Exactly equals a full-history
    * recompute (spec'd) PROVIDED the batch is append-only per key —
    * every new (ts, ord) sorts after the key's current valid_from (the
    * semanticDedupTextApply id discipline), and `validate` fails fast
    * when it is not.
    *
    * State touched: current rows of AFFECTED keys only (one row each) +
    * the batch — closed history is read-only passthrough. Version
    * numbers continue from the current row's.
    *
    * `validate` (default on) ENFORCES the append-only contract instead
    * of trusting it: a batch change timestamped before its key's
    * current valid_from would have to rewrite sealed history, and
    * without the check it would silently splice a wrong version chain.
    * The check is one batch-sized join + count (the
    * perplexityBuckets guard precedent); callers that have already
    * validated upstream can switch it off.
    */
  def scd2Apply(history: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, ordCol: String, valueCol: String,
      validate: Boolean = true): DataFrame = {
    val affected = changes.select(col(keyCol)).distinct()
    if (validate) {
      val bad = changes.select(col(keyCol), col(tsCol))
        .join(history.where(col("is_current") === 1)
          .select(col(keyCol), col("valid_from")), Seq(keyCol))
        .where(col(tsCol) < col("valid_from"))
        .count()
      require(bad == 0L,
        s"scd2Apply: $bad batch change(s) are timestamped before their " +
          "key's current valid_from — they would rewrite sealed history. " +
          "Replay from a full-history scd2() instead, or fix the feed " +
          "(validate = false skips this check once enforced upstream).")
    }
    val cur = history.where(col("is_current") === 1)
      .join(affected, Seq(keyCol))
      .select(col(keyCol), col("valid_from").as(tsCol),
        // the current row re-enters the fold as a pseudo-change that
        // sorts FIRST for its key (its ts seals the append-only floor);
        // minimal ord keeps it ahead of same-instant batch rows
        lit(Long.MinValue).as(ordCol), col("state").as(valueCol),
        col("version").as("_base_version"))
    val folded = scd2(
      cur.drop("_base_version").unionByName(
        changes.select(col(keyCol), col(tsCol), col(ordCol).cast("long")
          .as(ordCol), col(valueCol))),
      keyCol, tsCol, ordCol, valueCol)
    // re-base version numbers: the fold numbered the current row 1.
    // Keys NEW to the history have no current row — left join, base 1
    val rebased = folded
      .join(cur.select(col(keyCol), col("_base_version")), Seq(keyCol), "left")
      .select(col(keyCol),
        (col("version") + coalesce(col("_base_version"), lit(1)) - 1)
          .as("version"),
        col("state"), col("valid_from"), col("valid_to"), col("is_current"))
    // splice: untouched keys' rows + affected keys' closed rows pass
    // through; affected current rows are replaced by the fold (which
    // re-emits them, possibly closed, under their original version)
    history
      .join(affected, Seq(keyCol), "left_anti")
      .unionByName(history.where(col("is_current") === 0)
        .join(affected, Seq(keyCol)))
      .unionByName(rebased)
  }
}
