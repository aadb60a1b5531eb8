package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out (optimization guide §2.2/§2.6, §6).
  *
  * Spark's file-split arithmetic (`maxSplitBytes = min(maxPartitionBytes,
  * max(openCostInBytes, bytes/minPartitionNum))`) cannot split inside one
  * parquet row group, so a single small single-row-group file — the local
  * bench's table shape — yields a ONE-task scan no matter the core count,
  * and every scan-stage kernel (TER/chrF/BLEU DPs, curation gates, the
  * covariance grid) runs single-threaded on a 32-core host. At production
  * scale the same tables are thousands of row groups and scans parallelize
  * naturally; the two shapes need different physical plans, not a constant
  * tuned for either.
  *
  * [[fanOut]] bridges them by DERIVING the decision from the input: when
  * (and only when) the frame's actual scan partitioning is starved relative
  * to the session's cores, insert one round-robin repartition so downstream
  * per-row work uses the whole machine; otherwise return the input
  * untouched (at scale the probe says "not starved" and the plan is
  * byte-identical to before). The probe runs once per semantically-distinct
  * plan per JVM and is cached — partitioning METADATA, not data: every
  * run still computes all results from the parquet inputs.
  *
  * Use ONLY above row-wise-pure work (per-row kernels, filters, aggregates,
  * joins keyed on columns): a repartition changes row placement and
  * intra-partition order, so partition-sensitive operators (the Packing
  * family's partition-local packing, `monotonically_increasing_id` chains
  * not behind an explicit sort) must not sit directly downstream.
  */
object Par {
  /** starved-or-not per (cores, analyzed-plan semantic hash); bounded by
    * the number of distinct table scans a session touches.
    */
  private val decided =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Boolean]()

  /** Ablation kill switch (GRAFT_FANOUT=0): makes fanOut the identity so
    * a fan/no-fan A/B runs in one JVM — measurement tooling, not a perf
    * knob; the default (on) is the optimized path.
    */
  private val enabled = sys.env.getOrElse("GRAFT_FANOUT", "1") != "0"
  @volatile var forceOff = false

  def fanOut(df: DataFrame): DataFrame = {
    if (!enabled || forceOff) return df
    // streaming frames: micro-batch partitioning is the source's business
    // (and the probe below cannot run on an unstarted stream)
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (cores <= 1) return df
    val key = (cores, df.queryExecution.analyzed.semanticHash())
    val starved = decided.computeIfAbsent(key, _ => {
      // only FILE-backed inputs qualify: an in-memory relation (test
      // fixture, literal frame) is never the 100 TB shape, and fanning it
      // would add an exchange to operators whose zero-shuffle plan is a
      // spec'd invariant
      val fileBacked = df.queryExecution.sparkPlan.exists {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => true
        case _ => false
      }
      fileBacked && df.rdd.getNumPartitions < cores
    })
    if (starved) df.repartition(cores) else df
  }
}
