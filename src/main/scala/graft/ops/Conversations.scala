package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation / SFT-sample assembly: turn streams → rendered training
  * text. The post-curation step that turns event-shaped data (chat turns,
  * tool calls, interaction logs) into one templated text per conversation,
  * with turns in event-time order and a stable tie-break.
  *
  * 100 TB scale shape: one hash exchange on the conversation key moving
  * (key, ts, id, rendered-line) tuples; the per-key `collect_list` buffer
  * is bounded by conversation length (inherently bounded for dialog data —
  * unlike corpus-wide aggregations this is the one place a per-key list is
  * the honest representation). Rendering is scan-stage string concat.
  */
object Conversations {

  /** Render each key's turns as `[type#id] props` lines, event-time
    * ordered ((ts, event_id) — unique, so the output is a pure function
    * of the data), joined with newlines. Returns (key, n_turns, text).
    */
  def render(events: DataFrame, keyCol: String = "user_id"): DataFrame =
    events
      .select(col(keyCol), col("ts"), col("event_id"),
        // null-field turns render as empty slots instead of nulling the
        // whole line: concat propagates null, array_join then SKIPS the
        // element while count() still counts it — n_turns and the text
        // would silently disagree (and the oracle's string_agg skips
        // nulls identically, so the gate could never catch it)
        concat(lit("["), coalesce(col("event_type"), lit("")), lit("#"),
          col("event_id"), lit("] "),
          coalesce(col("props"), lit(""))).as("line"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("line")))),
            s => s.getField("line")),
          "\n").as("text"))
}
