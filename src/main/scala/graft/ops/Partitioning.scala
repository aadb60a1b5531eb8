package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical distribution operators (SURVEY.md §2.9, reference
  * Partitions.scala).
  *
  * Flink's `partitionCustom`/`shuffle`/`setParallelism` map to Spark's
  * repartition family. Operator chaining (`startNewChain`/`disableChaining`,
  * reference Partitions.scala:175-206) is intentionally dropped:
  * WholeStageCodegen fuses narrow chains automatically (SURVEY.md §4).
  */
object Partitioning {

  /** P1: hash-partition by key (`partitionCustom(hashCode % n)`,
    * reference Partitions.scala:67-81).
    */
  def hashPartition(df: DataFrame, n: Int, key: Column): DataFrame =
    df.repartition(n, key)

  /** P2: the degenerate all-to-one-partition skew demonstration
    * (reference Partitions.scala:104-116) — everything hashes to one
    * partition. Kept as the negative exemplar; AQE's skew handling is the
    * production answer (SURVEY.md §4).
    */
  def skewToOne(df: DataFrame, n: Int): DataFrame =
    df.repartition(n, lit(0))

  /** P3: `.shuffle` — random (round-robin) redistribution
    * (reference Partitions.scala:156).
    */
  def rebalance(df: DataFrame, n: Int): DataFrame =
    df.repartition(n)

  /** P4: sink parallelism 1 → single output file
    * (reference BuiltIn.scala:104-123).
    */
  def singleFile(df: DataFrame): DataFrame =
    df.coalesce(1)

  /** Partition sizes as (partitionId, rows) — the verification device the
    * reference uses by printing subtask indices
    * (reference Partitions.scala:85-100).
    */
  def partitionSizes(df: DataFrame): DataFrame =
    df.select(spark_partition_id().as("pid"))
      .groupBy("pid").count().withColumnRenamed("count", "rows")

  /** Salted join — the skew tool for the case AQE can't fix (one hot key
    * flooding a reducer in a shuffle join): the fact side gets a uniform
    * salt, the (small-ish) dim side is replicated `salts`×, and the join key
    * becomes (key, salt) so the hot key spreads over `salts` reducers.
    * Result is exactly the unsalted inner join (asserted in JoinsSpec). The
    * skew the reference *demonstrates* (P2, reference
    * Partitions.scala:104-129) is what this repairs.
    *
    * The salt is a DETERMINISTIC function of row content — never `rand()`
    * or `monotonically_increasing_id()`, whose draws depend on partition
    * layout and break retry idempotence (a re-executed task would re-salt
    * differently, and a stateful consumer downstream would see different
    * partitioning across attempts).
    *
    * Limit of determinism: BYTE-IDENTICAL duplicate rows necessarily share
    * a salt (any pure function of content does), so a hot key consisting
    * of millions of identical rows still skews — deduplicate (or count-
    * compress) identical rows first; that is cheaper than joining them
    * anyway. Content salting fixes the common case: one key, many distinct
    * rows.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts))
        .cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew profile for a prospective shuffle key — the measurement that
    * decides BETWEEN the tools above (plain hash join vs [[saltedJoin]] vs
    * broadcast) BEFORE a 100 TB shuffle pays for the wrong choice, the
    * same run-the-telemetry-first doctrine as
    * [[graft.ops.Similarity.blockOccupancy]]. Top `topN` hottest keys,
    * each row carrying the global frame: total rows, distinct keys, the
    * key's share of all rows, and exact p50/p99 group sizes (exact
    * `percentile` — the aggregate runs on the counts frame, one row per
    * key, not on the data). One token-free shuffle: groupBy(key) moves
    * (key, partial-count) pairs; the stats aggregate and top-N are
    * counts-sized.
    *
    * Reading it: `max share ≈ 1/n_keys` → uniform, shuffle freely;
    * `share(top1) ≫ p99/n_rows` → salt that key or broadcast the other
    * side; `n_keys` small and `n_rows/n_keys` huge → the key is not a
    * partitioning key at all.
    */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key).cast("string").as("key")).agg(
      count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
      round(expr("percentile(cnt, 0.5)"), 4).as("p50_cnt"),
      round(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"))
    // top-N via orderBy+limit (distributed TakeOrderedAndProject), THEN
    // rank the <= topN survivors — ranking the full counts frame with an
    // unpartitioned row_number window would single-partition-sort every
    // distinct key (billions at 100 TB). The survivor rank itself is
    // window-free too: partitionBy(lit(0)) LOOKED safe, but constant
    // folding erases the foldable key and the unpartitioned-Window WARN
    // comes back at runtime — instead collect the bounded survivors into
    // one sorted array ((-cnt, key) asc = the same order) and posexplode,
    // rank = position
    counts.orderBy(col("cnt").desc, col("key")).limit(topN)
      .agg(collect_list(
        struct((-col("cnt")).as("_nc"), col("key"), col("cnt"))).as("_t"))
      .select(posexplode(array_sort(col("_t"))).as(Seq("_i", "_s")))
      .select((col("_i") + 1).cast("int").as("rank"),
        col("_s.key").as("key"), col("_s.cnt").as("cnt"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt") / col("n_rows"), 6).as("share"),
        col("n_rows"), col("n_keys"), col("p50_cnt"), col("p99_cnt"))
  }

  /** Z-order (Morton) key over integral columns — the multi-column data
    * layout tool: range-clustering files by `zval` bounds EVERY input
    * column's min/max per file, so scans filtering on ANY of the columns
    * skip files (a plain sort bounds only its leading column; the second
    * column's per-file span stays the full range). This is what
    * Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it is an explicit
    * column so the clustering composes with `repartitionByRange` +
    * `sortWithinPartitions` + any writer.
    *
    * Mechanics: each column affine-quantizes to `bits` bits with EXACT
    * integer arithmetic — q = ((v − min) · 2^bits) div (max − min + 1),
    * min/max from a one-row broadcast aggregate — then the bit planes
    * interleave: bit b of column i lands at position b·n_cols + i. The
    * quantized columns are STAGED as projections once and the
    * bits·n_cols interleave terms reference the staged columns (the
    * per-element re-evaluation trap, avoided by construction). Every
    * step is div/%/× on BIGINT — bit-identical in any engine, no float
    * anywhere.
    *
    * Scale shape: the min/max aggregate is one scan + a one-row
    * broadcast; the key itself is a pure scan-stage expression. At
    * 100 TB the aggregate is usually replaced by known catalog stats —
    * pass them via `statsOverride`.
    */
  def zOrdered(df: DataFrame, cols: Seq[String], bits: Int,
      statsOverride: Map[String, (Long, Long)] = Map.empty): DataFrame = {
    val nc = cols.length
    require(nc >= 2, s"zOrdered: need >= 2 columns, got $nc")
    require(bits >= 1 && nc * bits <= 62,
      s"zOrdered: need 1 <= bits and n_cols*bits <= 62, got $nc x $bits")
    val withStats =
      if (cols.forall(statsOverride.contains)) {
        cols.foldLeft(df) { (d, c) =>
          val (lo, hi) = statsOverride(c)
          d.withColumn(s"_min_$c", lit(lo)).withColumn(s"_max_$c", lit(hi))
        }
      } else {
        val aggs = cols.flatMap(c => Seq(
          min(col(c)).cast("long").as(s"_min_$c"),
          max(col(c)).cast("long").as(s"_max_$c")))
        df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
      }
    val scale = 1L << bits
    val quantized = cols.foldLeft(withStats) { (d, c) =>
      d.withColumn(s"_q_$c", expr(
        s"((CAST($c AS BIGINT) - _min_$c) * ${scale}L) div " +
          s"(_max_$c - _min_$c + 1)"))
    }
    val terms = for {
      b <- 0 until bits; (c, ci) <- cols.zipWithIndex
    } yield s"((_q_$c div ${1L << b}L) % 2) * ${1L << (b * nc + ci)}L"
    quantized.withColumn("zval", expr(terms.mkString(" + ")))
      .drop(cols.flatMap(c =>
        Seq(s"_min_$c", s"_max_$c", s"_q_$c")): _*)
  }

  /** The locality evidence behind [[zOrdered]]: bucket rows by the top
    * bits of `zval` (`nBuckets` must be a power of two — buckets are
    * exactly the file boundaries a range-clustered write would draw) and
    * report each bucket's per-column value span. Read it against the
    * global ranges: under z-order EVERY column's average span is ≈
    * range/2^(bits-consumed-per-col); under a single-column sort the
    * other columns read ≈ the full range. Aggregation-only — the audit
    * never moves more than (bucket, extrema) tuples.
    */
  def zOrderAudit(df: DataFrame, cols: Seq[String], bits: Int,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0,
      s"zOrderAudit: nBuckets must be a power of two, got $nBuckets")
    val space = 1L << (cols.length * bits)
    require(nBuckets <= space,
      s"zOrderAudit: $nBuckets buckets exceed the $space-point key space")
    zOrdered(df, cols, bits)
      .withColumn("bucket", expr(s"zval div ${space / nBuckets}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        cols.map(c =>
          (max(col(c)) - min(col(c))).cast("long").as(s"span_$c")): _*)
  }
}
