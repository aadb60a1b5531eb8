package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered exact joins — the 100 TB shape for "remove every
  * corpus row whose key appears in a billion-row blocklist" (incremental
  * snapshot dedup, benchmark-id blocklists, opt-out lists).
  *
  * The plain `left_anti` join shuffles BOTH sides on the key: at 100 TB
  * the corpus side of that exchange is the whole corpus (or at least its
  * keys), even though blocklist hits are rare. A bloom filter built over
  * the blocklist keys (mergeable, built executor-side by
  * `DataFrameStatFunctions.bloomFilter`'s treeAggregate — ~1.2 GB for 10⁹
  * keys at 1 % fpp, vs an unbroadcastable multi-GB hash relation) splits
  * the corpus scan-stage into:
  *
  *   - `!mightContain` rows — definitively clean (a bloom filter has no
  *     false negatives) → emitted with NO shuffle at all;
  *   - `mightContain` rows — true hits plus ~fpp false positives → the
  *     only rows that reach the exact anti-join's exchange.
  *
  * The result is row-for-row identical to the plain anti-join (the exact
  * join adjudicates every bloom "maybe"); only the shuffle volume changes:
  * corpus × (hit_rate + fpp) instead of corpus × 1. The two `where`
  * branches each scan the corpus (both scans pushed-down + pipelined,
  * no materialization) — trading a second cheap scan for eliminating the
  * dominant exchange, the same trade Spark's own runtime row-level
  * bloom-filter injection (SPARK-32268) makes; this operator is the
  * explicit form for when the blocklist is a separate table the planner
  * cannot see through (persisted snapshots, cross-job blocklists).
  *
  * Probe side reuses Spark's internal [[BloomFilterMightContain]]
  * predicate (codegen'd, one lazy deserialize per task) over
  * `xxhash64(key)`; the build side puts the same `xxhash64` longs, so
  * build and probe agree for any key type.
  */
object BloomJoin {

  /** Serialized bloom filter over `xxhash64(key)` of `keys`. Built
    * distributed (partial filters per partition, OR-merged); `fpp` is the
    * false-positive rate at `expectedItems` — false positives only cost
    * exact-join traffic, never correctness. `expectedItems <= 0` counts
    * the build side first (one cheap key-only job); production callers
    * with a known blocklist cardinality pass it to skip that job.
    */
  def buildBloom(keys: DataFrame, key: Column,
      expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val hashed = keys.select(xxhash64(key).as("h"))
    val n =
      if (expectedItems > 0) expectedItems
      else math.max(hashed.count(), 64L)
    val bf = hashed.stat.bloomFilter("h", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe: may return true for a key never inserted
    * (rate ~fpp), never false for an inserted key.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom),
      GraftSqlBridge.expression(xxhash64(key))))

  /** Exact `left_anti` join of `left` against `blocklist` on `keyCol`,
    * bloom-prefiltered: result is identical to
    * `left.join(blocklist, keyCol, "left_anti")`, but only bloom-flagged
    * rows (true hits + ~fpp false positives) reach the join's shuffle.
    *
    * `left` must be DETERMINISTIC across re-evaluation: the plan scans it
    * twice (clean branch + adjudicated branch), so a frame derived from
    * `rand()`, unstable sampling, or a source mutated between scans can
    * disagree between branches, dropping or duplicating rows vs the plain
    * anti-join. Spark's own runtime bloom injection carries the same
    * caveat. Non-deterministic inputs: materialize first
    * (`persist()`/`localCheckpoint()`) and pass the pinned frame.
    */
  def bloomAntiJoin(left: DataFrame, blocklist: DataFrame, keyCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(blocklist, col(keyCol), expectedItems, fpp)
    val flagged = mightContain(bloom, col(keyCol))
    val clean = left.where(!flagged)
    val adjudicated = left.where(flagged)
      .join(blocklist.select(keyCol).distinct(), Seq(keyCol), "left_anti")
    // anti-join reorders columns (key first); restore the left schema
    clean.unionByName(adjudicated.select(left.columns.map(col).toSeq: _*))
  }

  /** The semi twin: rows of `left` whose key IS in `allowlist`, exact.
    * Clean-branch rows are definitively absent, so only flagged rows join.
    */
  def bloomSemiJoin(left: DataFrame, allowlist: DataFrame, keyCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(allowlist, col(keyCol), expectedItems, fpp)
    left.where(mightContain(bloom, col(keyCol)))
      .join(allowlist.select(keyCol).distinct(), Seq(keyCol), "left_semi")
      .select(left.columns.map(col).toSeq: _*)
  }
}
