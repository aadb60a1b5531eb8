package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard assembly: greedy token-budget packing.
  *
  * A training pipeline's last step groups documents into fixed-token-budget
  * shards (sequence-packing units / data files). The global bin-packing
  * optimum is NP-hard and needs global state; the scalable form packs
  * GREEDILY WITHIN PARTITIONS: hash-repartition docs for even spread, sort
  * within each partition for determinism, then one sequential pass per
  * partition assigns shard ids. Zero driver involvement, zero cross-
  * partition coordination — shard ids are (partition, local-sequence)
  * pairs, unique by construction. Waste vs the global optimum is bounded by
  * one underfull shard per partition, negligible when partitions hold many
  * budgets' worth of tokens (always true at scale).
  *
  * This is the one operator family where an imperative per-partition pass
  * (`mapPartitions`) genuinely beats expressing the logic relationally:
  * running-sum-with-reset-on-threshold has no shuffle-free SQL form.
  */
object Packing {

  /** Assign every document to a shard such that no shard exceeds `budget`
    * tokens (an oversized single document gets a shard to itself).
    * Deterministic for fixed `parts`: murmur3 hash repartitioning and the
    * in-partition doc_id sort don't depend on cluster layout or retries.
    * Returns (doc_id, n_tokens, shard_id).
    *
    * The shard-id partition half comes from the DATA — `pmod(hash(doc_id),
    * parts)`, the exact HashPartitioning expression `repartition` routes
    * by — NOT from `TaskContext.getPartitionId()`. The round-15 oracle
    * conversion caught the latter as a REAL uniqueness bug: a narrow
    * downstream `coalesce` (any single-file writer) pipelines several
    * parent partitions into one task, every parent iterator then reads
    * the SAME task id, and shard ids silently collide across partitions.
    * The data-derived pid is constant within a hash partition by
    * construction and immune to any narrow rearrangement or retry.
    */
  def packByTokenBudget(docs: DataFrame, budget: Long,
      parts: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        size(Core.tokensUni(col("text"))).cast("long").as("n_tokens"),
        pmod(hash(col("doc_id")), lit(parts)).cast("long").as("_pid"))
      .repartition(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var shard = 0L
        var used = 0L
        it.map { case (id, n, pid) =>
          if (used > 0 && used + n > budget) { shard += 1; used = 0L }
          used += n
          (id, n, (pid << 32) | shard)
        }
      }
      .toDF("doc_id", "n_tokens", "shard_id")
  }

  /** Pack-then-chunk sequence assembly — the actual pretraining form:
    * concatenate documents' token streams (deterministic doc_id order
    * within hash-assigned partitions) and cut exact `seqLen`-token
    * training sequences ACROSS document boundaries, so no padding is
    * wasted ([[chunkTokens]] is the per-document form; this is the
    * corpus-level one). Every sequence is exactly `seqLen` tokens except
    * at most one final partial per partition. seq_id = (partition ≪ 32) |
    * local index — unique and retry-stable by the same argument as
    * [[packByTokenBudget]].
    *
    * Scale shape: one hash exchange of (id, tokens), then a single
    * sequential pass per partition with an O(seqLen)-bounded carry
    * buffer; no driver involvement, no global coordination.
    */
  def packedSequences(docs: DataFrame, seqLen: Int, parts: Int = 32,
      idCol: String = "doc_id", textCol: String = "text",
      eosToken: Option[String] = None): DataFrame =
    packedSequencesWithBounds(docs, seqLen, parts, idCol, textCol, eosToken)
      .select(col("seq_id"), col("n_tokens"), col("text"))

  /** [[packedSequences]] plus the metadata trainers actually need from a
    * packed stream: per sequence, the 0-based token offsets where a NEW
    * document starts (`doc_starts`) and the matching ids (`doc_ids`) —
    * the inputs to a block-diagonal attention mask (no cross-document
    * attention) and to provenance tracking. A sequence that begins
    * mid-document has no offset-0 entry (the document started in an
    * earlier sequence); zero-token documents contribute no tokens and no
    * boundary. This is THE definition — [[packedSequences]] is a
    * projection of it, so the two can never drift (the winnowing
    * one-definition lesson). Partitioning/ordering key on the ORIGINAL
    * id column (any orderable type, the pre-existing packedSequences
    * contract — hashing is unchanged for int ids); the `doc_ids` bounds
    * column is a LONG try_cast of it, so non-numeric/null ids pack
    * correctly but surface as -1 there (provide a numeric surrogate key
    * when provenance matters). Same scale shape: one (id, tokens)
    * exchange, one sequential per-partition pass, O(seqLen) carry + a
    * boundary queue bounded by docs-per-sequence.
    *
    * `eosToken`: when set, each NON-EMPTY document's token stream gets
    * this sentinel appended before concatenation — the end-of-document
    * token causal LMs are trained to emit. The sentinel counts toward
    * `n_tokens` and sequence budgets (that's what the trainer sees);
    * `doc_starts` still mark the first REAL token of each document (the
    * following document therefore starts right after the previous one's
    * sentinel). Zero-token documents contribute no sentinel — they were
    * never in the stream. Applied in the scan-stage projection, so the
    * partition pass and its carry/boundary machinery are untouched.
    */
  def packedSequencesWithBounds(docs: DataFrame, seqLen: Int,
      parts: Int = 32, idCol: String = "doc_id",
      textCol: String = "text", eosToken: Option[String] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(parts > 0, s"parts must be positive, got $parts")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text → zero tokens, not an executor NPE on the null Seq;
    // try_cast → null (not an ANSI runtime error) for non-numeric ids
    val rawToks = coalesce(Core.tokensUni(col(textCol)),
      array().cast("array<string>"))
    val toksCol = eosToken.fold(rawToks)(e =>
      when(size(rawToks) > 0, concat(rawToks, array(lit(e))))
        .otherwise(rawToks))
    docs.select(col(idCol).as("_k"),
        expr(s"try_cast(`$idCol` AS BIGINT)").as("_id"),
        toksCol.as("toks"))
      .repartition(parts, col("_k"))
      .sortWithinPartitions("_k")
      // pid from the DATA (the HashPartitioning expression itself), not
      // TaskContext: under a narrow downstream coalesce every pipelined
      // parent partition reads the same task id and seq_ids collide —
      // the packByTokenBudget round-15 bug, same fix
      .select(col("_id"), col("toks"),
        pmod(hash(col("_k")), lit(parts)).cast("long").as("_pid"))
      .as[(Option[Long], Seq[String], Long)]
      .mapPartitions { it0 =>
        var idx = 0L
        val buf = new scala.collection.mutable.ArrayBuffer[String]()
        var off = 0
        var appendedAbs = 0L // tokens ever appended in this partition
        var consumedAbs = 0L // tokens ever emitted in this partition
        // (absolute start, doc id) of docs not yet emitted into a sequence
        val starts = new scala.collection.mutable.ArrayDeque[(Long, Long)]()
        // (absolute start, pid) per appended doc: emit stamps the pid of
        // the doc whose tokens OPEN the sequence (round-15 advice — pid
        // carried per-row through the fold like packByTokenBudget, not a
        // side-effecting var whose value depends on iterator pipelining).
        // Under hash repartitioning every doc in a partition shares one
        // pid, so today this is equal; if upstream partitioning ever
        // changes, the stamp stays tied to the data, not to read order.
        val pids = new scala.collection.mutable.ArrayDeque[(Long, Long)]()
        def emit(n: Int): (Long, Int, String, Seq[Int], Seq[Long]) = {
          val s = buf.slice(off, off + n).mkString(" ")
          // pid of the doc covering the first token of this sequence:
          // drop entries fully before consumedAbs (keeping the covering one)
          while (pids.length > 1 && pids(1)._1 <= consumedAbs) pids.removeHead()
          val pid = pids.head._2
          val hi = consumedAbs + n
          val b = new scala.collection.mutable.ArrayBuffer[(Int, Long)]()
          while (starts.nonEmpty && starts.head._1 < hi) {
            val (abs, id) = starts.removeHead()
            b += (((abs - consumedAbs).toInt, id))
          }
          consumedAbs = hi
          off += n
          if (off > (1 << 16)) { buf.remove(0, off); off = 0 }
          val r = ((pid << 32) | idx, n, s, b.map(_._1).toSeq, b.map(_._2).toSeq)
          idx += 1
          r
        }
        val full = it0.flatMap { case (id, toks, p) =>
          if (toks.nonEmpty) {
            starts += ((appendedAbs, id.getOrElse(-1L)))
            pids += ((appendedAbs, p))
            appendedAbs += toks.length
            buf ++= toks
          }
          Iterator.continually(())
            .takeWhile(_ => buf.length - off >= seqLen)
            .map(_ => emit(seqLen))
        }
        // the trailing partial materializes only after `full` is drained
        full ++ Iterator.unfold(()) { _ =>
          if (buf.length - off > 0) Some((emit(buf.length - off), ()))
          else None
        }.take(1)
      }
      .toDF("seq_id", "n_tokens", "text", "doc_starts", "doc_ids")
  }

  /** Length-bucketed batch assembly — the dynamic-batching prep step: SFT
    * and inference batches want same-length-ish documents together (one
    * 2k-token straggler pads a whole batch of 100-token rows to 2k).
    * Documents bucket by the smallest `bucketEdges` entry >= their token
    * count (larger docs → the overflow bucket Int.MaxValue), then batch
    * ordinals are assigned within (bucket, shard): shard = the leading
    * hex digit of the salted id hash, so ordering work fans out 16 ways
    * instead of one global row_number per bucket (the
    * [[graft.ops.Sampling.deterministicShuffle]] hash-range argument —
    * add digits as the corpus grows). Order within a shard is (hash, id):
    * deterministic, decorrelated from corpus order, retry-stable. At most
    * one underfull batch per (bucket, shard) — the packByTokenBudget
    * waste bound.
    *
    * Returns (idCol, n_tokens, bucket, shard, batch_idx, pos_in_batch);
    * a batch is globally identified by (bucket, shard, batch_idx).
    */
  def lengthBucketBatches(docs: DataFrame, bucketEdges: Seq[Int],
      batchSize: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(bucketEdges.nonEmpty && bucketEdges == bucketEdges.sorted &&
      bucketEdges.head > 0, s"bucketEdges must be sorted positive: $bucketEdges")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    import org.apache.spark.sql.expressions.Window
    val n = greatest(size(Core.tokensUni(col(textCol))), lit(0))
    val bucket = bucketEdges.foldRight(lit(Int.MaxValue)) { (e, acc) =>
      when(col("n_tokens") <= e, lit(e)).otherwise(acc)
    }
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("_hk"), col(idCol))
    docs
      .select(col(idCol), n.as("n_tokens"),
        Sampling.hashKey(col(idCol), "lb").as("_hk"))
      .select(col(idCol), col("n_tokens"), bucket.as("bucket"),
        substring(col("_hk"), 2, 1).as("shard"), col("_hk"))
      .withColumn("_rk", row_number().over(w) - 1)
      .select(col(idCol), col("n_tokens"), col("bucket"), col("shard"),
        (col("_rk") / batchSize).cast("int").as("batch_idx"),
        (col("_rk") % batchSize).cast("int").as("pos_in_batch"))
  }

  /** Padding-waste telemetry over a [[lengthBucketBatches]]-shaped frame
    * ((bucket, shard, batch_idx) identify a batch; `n_tokens` per row):
    * each batch runs padded to its longest member, so its waste is
    * n·max − Σ tokens; the report is one row — batches, docs, real
    * tokens, padded slots, and waste_frac = padded/(padded+real), the
    * number that justifies (or kills) bucketed batching versus batching
    * in arrival order. Batch-sized aggregation then a one-row fold;
    * nothing data-sized moves.
    */
  def paddingWaste(batches: DataFrame, policy: String): DataFrame =
    batches.groupBy("bucket", "shard", "batch_idx")
      .agg(count(lit(1)).as("_n"),
        max(col("n_tokens")).cast("long").as("_mx"),
        sum(col("n_tokens")).as("_sm"))
      .agg(count(lit(1)).as("n_batches"), sum("_n").as("n_docs"),
        sum("_sm").as("total_tokens"),
        sum(col("_n") * col("_mx") - col("_sm")).as("padded_slots"))
      .select(lit(policy).as("policy"), col("n_batches"), col("n_docs"),
        col("total_tokens"), col("padded_slots"),
        round(col("padded_slots").cast("double") /
          (col("padded_slots") + col("total_tokens")), 4).as("waste_frac"))

  /** Fill-in-the-middle transform — the code-LLM data-prep step that
    * teaches infilling: a deterministic `fimRate` hash-fraction of
    * documents has its token stream cut at two points and re-emitted in
    * PSM order (`<fim_prefix> P <fim_suffix> S <fim_middle> M`), so the
    * model learns to generate the middle conditioned on both sides;
    * the rest pass through verbatim. Cut points are pure integer
    * arithmetic on the id (two co-prime multipliers mod the admissible
    * range) — like every sampling decision here, a pure function of the
    * data: retries, re-runs, and the DuckDB oracle agree row for row,
    * where an RNG draw would re-deal the cuts per run. c1 is uniform over
    * [0, n], c2 over [c1, n]; empty segments simply vanish from the
    * join, and a zero-token or unselected document is returned unchanged
    * with fim = 0.
    *
    * Scale shape: scan-stage only — the hash predicate, cuts, slices,
    * and join are all narrow per-row expressions; nothing shuffles.
    */
  def fimTransform(docs: DataFrame, fimRate: Double, salt: String = "fim",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0,
      s"fimRate must be in [0,1], got $fimRate")
    val toks = col("_toks")
    val n = size(toks)
    // cut points via the shared folded-offset arithmetic (Core.foldedOffset
    // — pmod'd, so negative ids can't produce negative slice lengths)
    val c1 = Core.foldedOffset(col(idCol), 7919L, n + 1)
    val c2 = c1 + Core.foldedOffset(col(idCol), 104729L,
      n.cast("long") - c1 + 1L)
    val sel = Sampling.hashKey(col(idCol), salt) <
      lit(Sampling.hexThreshold(fimRate))
    val fimText = array_join(
      concat(
        array(lit("<fim_prefix>")), slice(toks, lit(1), c1.cast("int")),
        array(lit("<fim_suffix>")),
        slice(toks, (c2 + 1).cast("int"), n - c2.cast("int")),
        array(lit("<fim_middle>")),
        slice(toks, (c1 + 1).cast("int"), (c2 - c1).cast("int"))),
      " ")
    docs
      .withColumn("_toks",
        coalesce(Core.tokensUni(col(textCol)), array().cast("array<string>")))
      .select(col(idCol),
        (sel && n > 0).cast("int").as("fim"),
        when(sel && n > 0, fimText).otherwise(col(textCol)).as(textCol))
  }

  /** T5/UL2-style span corruption — the denoising objective's data
    * transform: mask pseudo-random token spans with `<extra_id_k>`
    * sentinels and emit the (input, target) pair, target = each sentinel
    * followed by the tokens it hid, closed by the final sentinel (Raffel
    * et al. 2019 §3.1.4 shape). Deterministic twin of the usual RNG
    * version so re-runs, shards, and engines agree row-for-row (the
    * [[fimTransform]] contract): one span per FULL `spanEvery`-token
    * window, span offset from the shared folded-id arithmetic
    * ([[Core.foldedOffset]] family) varied per window by the window
    * index, all integer ops. Corruption density = spanLen/spanEvery
    * (defaults ≈ T5's 0.15 at mean span 3 — 3/20); documents shorter
    * than one window pass through uncorrupted with the bare closing
    * sentinel as target.
    *
    * Scale shape: pure scan-stage array expressions over a projected
    * token column (the safe bound form — no expression ever re-derives
    * the tokenization) — zero shuffle, like [[chunkTokens]]. Returns
    * (idCol, n_tokens, n_spans, input, target).
    */
  def spanCorrupt(docs: DataFrame, spanEvery: Int = 20, spanLen: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(spanLen >= 1 && spanEvery > spanLen,
      s"need 1 <= spanLen < spanEvery, got $spanLen/$spanEvery")
    val avail = (spanEvery - spanLen + 1).toLong
    val toks = col("_toks")
    val n = size(toks)
    val nSeg = floor(n / lit(spanEvery)).cast("int")
    def sentinel(i: Column): Column =
      concat(lit("<extra_id_"), i.cast("string"), lit(">"))
    // per-window offset in [0, avail): folded id × co-prime + window
    // index × a second co-prime, pmod'd — the fimTransform cut-point
    // family with the window index as the varying term
    def off(i: Column): Column =
      pmod(pmod(col(idCol).cast("long"), lit(1000003L)) * 7919L +
        (i.cast("long") + 1L) * 104729L, lit(avail)).cast("int")
    val segs = sequence(lit(0), nSeg - 1)
    val emptyArr = array().cast("array<string>")
    // input: [pre-span | sentinel_i | post-span] per window + the tail
    val inputToks = concat(
      when(nSeg >= 1, flatten(transform(segs, i => concat(
        slice(toks, i * spanEvery + 1, off(i)),
        array(sentinel(i)),
        slice(toks, i * spanEvery + off(i) + lit(spanLen) + 1,
          lit(spanEvery) - off(i) - lit(spanLen)))))).otherwise(emptyArr),
      slice(toks, nSeg * spanEvery + 1, n - nSeg * lit(spanEvery)))
    // target: sentinel_i + hidden span per window, closing sentinel last
    val targetToks = concat(
      when(nSeg >= 1, flatten(transform(segs, i => concat(
        array(sentinel(i)),
        slice(toks, i * spanEvery + off(i) + 1, lit(spanLen))))))
        .otherwise(emptyArr),
      array(sentinel(nSeg)))
    docs
      .withColumn("_toks",
        coalesce(Core.tokensUni(col(textCol)), emptyArr))
      .select(col(idCol), n.cast("long").as("n_tokens"),
        nSeg.cast("long").as("n_spans"),
        array_join(inputToks, " ").as("input"),
        array_join(targetToks, " ").as("target"))
  }

  /** Sliding-window token chunking — the sequence-prep step that splits
    * each document into `chunkSize`-token windows every `stride` tokens
    * (stride < chunkSize ⇒ overlapping context windows, the usual LLM
    * pretraining shape). The final partial window is kept; windows that
    * would add no new tokens (start ≥ len − chunkSize + stride) are not
    * emitted, so coverage is exact with no redundant suffix chunks.
    * Untokenizable documents emit nothing.
    *
    * Scale shape: `sequence` + `explode` is a narrow per-row expansion in
    * the scan stage — no shuffle anywhere, output rows ≈ tokens/stride.
    * Returns (doc_id, chunk_idx, chunk_start, n_tokens, chunk_text).
    */
  def chunkTokens(docs: DataFrame, chunkSize: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val len = size(col("toks"))
    docs
      .select(col(idCol), Core.tokensUni(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0),
          greatest(len - chunkSize + (stride - 1), lit(0)),
          lit(stride))).as("chunk_start"))
      .select(
        col(idCol),
        (col("chunk_start") / stride).cast("int").as("chunk_idx"),
        col("chunk_start"),
        least(lit(chunkSize), size(col("toks")) - col("chunk_start"))
          .as("n_tokens"),
        array_join(slice(col("toks"), col("chunk_start") + 1, lit(chunkSize)),
          " ").as("chunk_text"))
  }
}
