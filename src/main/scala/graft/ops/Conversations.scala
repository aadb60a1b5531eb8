package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The ONE rendered-line definition shared by [[render]] and
    * [[renderSessions]] (the winnowing one-definition lesson: two copies
    * of a template expression WILL drift). Null-field turns render as
    * empty slots instead of nulling the whole line: concat propagates
    * null, array_join then SKIPS the element while count() still counts
    * it — n_turns and the text would silently disagree (and the oracle's
    * string_agg skips nulls identically, so the gate could never catch
    * it).
    */
  private def lineCol: Column =
    concat(lit("["), coalesce(col("event_type"), lit("")), lit("#"),
      col("event_id"), lit("] "),
      coalesce(col("props"), lit("")))

  /** The ONE assembly aggregation: turn count + newline-joined lines in
    * ((ts, event_id) — unique, so the output is a pure function of the
    * data) event-time order.
    */
  private def renderAggs: Seq[Column] = Seq(
    count(lit(1)).as("n_turns"),
    array_join(
      transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("line")))),
        s => s.getField("line")),
      "\n").as("text"))

  /** Render each key's turns as `[type#id] props` lines, event-time
    * ordered, joined with newlines. Returns (key, n_turns, text).
    */
  def render(events: DataFrame, keyCol: String = "user_id"): DataFrame =
    events
      .select(col(keyCol), col("ts"), col("event_id"), lineCol.as("line"))
      .groupBy(keyCol)
      .agg(renderAggs.head, renderAggs.tail: _*)

  /** Preference-pair (DPO/RLHF-reward) assembly: per key, the
    * best-scored and worst-scored candidates as one (chosen, rejected)
    * training pair — keys with no STRICT preference (all candidates tie,
    * or a single candidate) emit nothing, because a zero-margin pair
    * teaches a preference model nothing and a same-text pair actively
    * hurts. Tie-breaks are deterministic (lowest id on equal score for
    * both sides), so the pair set is a pure function of the data.
    *
    * 100 TB scale shape: ONE map-side-combinable aggregation — each
    * partial buffer holds at most two (score, id, text) structs per key,
    * so candidate text crosses the exchange only inside those two
    * structs, never as the full candidate set; no window, no self-join.
    */
  def preferencePairs(cands: DataFrame, keyCol: String,
      idCol: String = "doc_id", scoreCol: String = "score",
      textCol: String = "text"): DataFrame = {
    // struct ordering compares fields left-to-right: score first, then
    // the id tie-break (negated on the max side so BOTH sides prefer the
    // lowest id); text rides along without ever being compared
    val chosen = max(struct(col(scoreCol).as("s"), (-col(idCol)).as("ni"),
      col(textCol).as("t")))
    val rejected = min(struct(col(scoreCol).as("s"), col(idCol).as("i"),
      col(textCol).as("t")))
    // null-scored candidates are excluded BEFORE aggregating: Spark's
    // struct ordering sorts null first, so an unfiltered min() would
    // elect a null-score candidate as "rejected" and the strict filter
    // would then null out the whole key — silently losing pairs the
    // non-null candidates clearly form (n_cands counts scored candidates)
    cands.where(col(scoreCol).isNotNull).groupBy(col(keyCol))
      .agg(chosen.as("c"), rejected.as("r"), count(lit(1)).as("n_cands"))
      .where(col("c.s") > col("r.s"))
      .select(col(keyCol),
        (-col("c.ni")).as("chosen_id"), col("c.t").as("chosen"),
        col("r.i").as("rejected_id"), col("r.t").as("rejected"),
        round(col("c.s") - col("r.s"), 4).as("score_gap"),
        col("n_cands"))
  }

  /** Loss-mask spans for SFT training: the [start, end) CHARACTER offsets,
    * into [[render]]'s text, of every turn whose type is in `trainTypes` —
    * the "train on assistant turns only" mask every SFT pipeline needs
    * (the trainer masks loss outside these spans). Alignment with the
    * rendered text is by construction, not by re-parsing: the same
    * [[lineCol]] template and the same (ts, event_id) ordering produce
    * both, so span k of a key always slices exactly its line (spec-
    * asserted by substring equality against [[render]]'s output).
    * Offsets account for the joining newlines; `k` is the 0-based ordinal
    * among the key's TRAINABLE turns.
    *
    * OFFSET UNIT: spans are UNICODE CODE POINT offsets (Spark `length`
    * semantics), not UTF-16 code units — a JVM consumer slicing the
    * rendered text with `String.substring` misaligns by one per
    * supplementary-plane character (emoji, rare CJK) preceding the span.
    * Slice with `text.codePointCount`-aware indexing (or
    * `offsetByCodePoints`), or guarantee BMP-only props upstream; the
    * spec's substring-equality assertion holds because the test fixture
    * is BMP-only.
    *
    * Scale shape: no per-key collect buffer at all — one hash exchange on
    * the key, then an in-partition running sum over (ts, event_id) order;
    * the filter to trainable turns happens after offsets are fixed (a
    * masked turn still advances the cursor), so output rows ≈ trainable
    * turns only. Returns (key, k, event_id, span_start, span_end).
    */
  def lossMaskSpans(events: DataFrame, trainTypes: Seq[String],
      keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("ts"), col("event_id"))
    val offs = events
      .select(col(keyCol), col("ts"), col("event_id"), col("event_type"),
        lineCol.as("line"))
      .withColumn("len", length(col("line")).cast("long"))
      // cursor BEFORE this line: previous lines plus one newline each
      .withColumn("span_start",
        coalesce(sum(col("len") + 1)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    offs.where(col("event_type").isin(trainTypes: _*))
      .select(col(keyCol),
        (row_number().over(w) - 1).as("k"),
        col("event_id"), col("span_start"),
        (col("span_start") + col("len")).as("span_end"))
  }

  /** Session-scoped assembly: one rendered conversation per (key,
    * session), a session closing after `gap` of event-time silence —
    * the SFT-pipeline ingest shape ([[render]] treats a key's whole
    * history as one conversation; real chat logs are session-delimited).
    * Same line template, same ordering, same aggregation as [[render]],
    * applied per `session_window`.
    *
    * Streaming twin for free: on a stream, apply
    * `events.withWatermark("ts", ...)` first and this exact function
    * assembles + flushes each conversation when the watermark passes its
    * session end (append mode) — Structured Streaming's session_window
    * merges partial sessions across micro-batches in the state store, so
    * open conversations buffer only their own turns. Batch and streaming
    * plans share this one definition (StreamingSpec parity-asserts it on
    * a replayed turn stream).
    *
    * Returns (key, sess_start, sess_end, n_turns, text); sess_end is
    * last-turn-ts + gap, Spark's session_window end.
    */
  def renderSessions(events: DataFrame, gap: String,
      keyCol: String = "user_id"): DataFrame =
    events
      .select(col(keyCol), col("ts"), col("event_id"), lineCol.as("line"))
      .groupBy(col(keyCol), session_window(col("ts"), gap))
      .agg(renderAggs.head, renderAggs.tail: _*)
      .select(col(keyCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_turns"), col("text"))
}
