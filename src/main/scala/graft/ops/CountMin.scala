package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a relational artifact — the fixed-size frequency
  * summary for token/URL/domain counts when the exact dictionary is too
  * large to keep: d·w counter cells answer point frequency queries with
  * one-sided error (never an underestimate; overestimate ≤ εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ — Cormode & Muthukrishnan
  * 2005). Complements [[graft.agg.Aggregators.SpaceSavingAggregator]]
  * (top-k identities) with arbitrary-key point estimates.
  *
  * The hash family is the repo's deterministic md5 convention — one
  * digest salted "cm&lt;d/4&gt;-" per GROUP of four rows, sliced into its
  * four independent 32-bit words (see [[bucket]]) — so build, merge, and
  * probe all replay exactly in any engine with md5: the sketch is data,
  * not driver state.
  *
  * Scale shape: the build is ONE aggregation whose key space is d·w
  * cells, so map-side combine reduces the shuffle to ≤ tasks·d·w rows no
  * matter the corpus size; merge is a cell-wise sum (associative,
  * commutative — the 100 TB shard-then-merge form); probing joins a
  * bounded probe list against the d·w-row sketch (broadcast).
  */
object CountMin {

  /** Cell column for hash row `d`: one md5 digest is 32 hex chars = four
    * independent 32-bit words, so rows 0-3 slice ONE digest (4× fewer
    * md5 evaluations per key — measured on the 10× token stream) and
    * every fourth row salts a fresh digest ("cm&lt;d/4&gt;-"). Uniform mod
    * `width`.
    */
  private[ops] def bucket(token: Column, d: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cm${d / 4}-"), token)),
      1 + 8 * (d % 4), 8), 16, 10).cast("long"), lit(width))

  /** Build the (d, bucket, cnt) cell table from a key column — one
    * explode by depth (scan-stage) into the cell-keyed aggregate. Cells
    * never touched stay absent (a probe reads them as 0).
    */
  def sketch(keys: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"bad dims: depth=$depth width=$width")
    keys.where(col(keyCol).isNotNull)
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          bucket(col(keyCol), d, width).as("bucket"))): _*)).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of sketches built with the same (depth, width). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))

  /** Streaming sketch maintenance: each micro-batch's cells merge into
    * the standing cell table (sum — associative/commutative, so
    * micro-batching ≡ one whole-corpus build, spec'd). `state`/`save`
    * own the ≤ d·w-row artifact, the weightedSampleServe read-write
    * pattern.
    */
  def serve(stream: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256)(state: () => DataFrame, save: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        save(merge(state(), sketch(batch, keyCol, depth, width)))
    }

  /** Point frequency estimates for a bounded probe list: min over the d
    * rows of each probe's cell counts (absent cell = 0). The probe side
    * broadcasts; the sketch is d·w rows.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val pb = probes.where(col(keyCol).isNotNull)
      .select(col(keyCol), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          bucket(col(keyCol), d, width).as("bucket"))): _*)).as("cell"))
      .select(col(keyCol), col("cell.d").as("d"), col("cell.bucket").as("bucket"))
    broadcast(pb).join(sketch, Seq("d", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
