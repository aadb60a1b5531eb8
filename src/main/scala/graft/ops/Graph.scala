package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. Web-scale pre-training
  * pipelines routinely rank pages by link centrality (PageRank/harmonic
  * family) and feed the score into quality filtering and sampling weights
  * — the reference's stream-analytics surface has no graph operator, but a
  * 100 TB web corpus pipeline is incomplete without one.
  *
  * Scale shape: the rank vector is NODE-sized and the edge list is
  * EDGE-sized; every iteration is one (src-keyed) join + one dst-keyed
  * aggregate — the Pregel-without-Pregel form. Edges are aggregated to
  * (src, dst, weight) once and persisted; per-iteration state is the rank
  * frame alone, localCheckpoint'd (node-sized, the Curation id-only
  * convention) so the plan does not deepen with iteration count.
  */
object Graph {

  /** Weighted transition edges from an ordered event log: consecutive
    * events of the same `userCol` (ordered by `orderCol`, ties by
    * `tieCol`) contribute one (src, dst) count. The per-user lead() is a
    * user-partitioned window — shuffles once on the user key, never a
    * global sort — and the (src, dst) aggregate is map-side combined.
    */
  def transitionEdges(events: DataFrame, nodeCol: String, userCol: String,
      orderCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(orderCol), col(tieCol))
    events
      .select(col(userCol), col(orderCol), col(tieCol),
        col(nodeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
  }

  /** Weighted PageRank with uniform teleport and proper dangling-mass
    * redistribution, `iterations` synchronous steps from a uniform start:
    *
    *   r'(v) = (1-d)/N + d · ( Σ_{u→v} r(u)·w(u,v)/outdeg(u) + dang/N )
    *
    * where `dang` = Σ r(u) over nodes with no out-edges. The node set is
    * src ∪ dst. Deterministic given the edge list, so a fixed-iteration
    * run is DuckDB-oracle-able with unrolled per-iteration CTEs
    * (q_pagerank); returns (node, rank) with rank rounded to 6 — the
    * usual cross-engine float-sum guard.
    *
    * Per-iteration cost: edges ⋈ ranks on src (the persisted edge frame
    * carries its outdeg — computed once, not per step), a dst-keyed sum,
    * and a one-row dangling aggregate broadcast into the update — no
    * step touches anything larger than edges + nodes. Rank frames are
    * localCheckpoint'd each step (node-sized) so iteration N's plan does
    * not replay steps 1..N-1.
    */
  def pageRank(edges0: DataFrame, iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    // Round 17 (guide §5 — recompute of a multiply-referenced subtree):
    // the edge frame feeds outdeg, the share projection, AND the node set
    // (src ∪ dst), so an un-cut lineage re-runs the caller's whole edge
    // DERIVATION (events scan + per-user window + aggregate for
    // q_pagerank) four times before the first iteration starts. One
    // edge-sized localCheckpoint — the same size class as the `e` frame
    // below — makes it one pass (warm 2.3 → 1.0 s at sf0.1; at scale it
    // is a 4× → 1× on the full input scan).
    val edges = edges0.localCheckpoint(false)
    val outdeg = edges.groupBy("src").agg(sum("weight").as("outdeg"))
    // localCheckpoint, not persist: every iteration joins this frame and
    // each join derives null-filters on its keys — with live lineage
    // those push below the projections and can re-run the whole edge
    // derivation per step (the Similarity.dedupFlagsByBlock lesson).
    // (A round-17 attempt to pre-partition this frame by src so each
    // iteration's join reuses one edge shuffle measured WORSE at sf0.1:
    // localCheckpoint's LogicalRDD reports UnknownPartitioning, so the
    // extra up-front exchange + sort bought nothing downstream — kept
    // out; see OPTIMIZATION_r17.md.)
    val e = edges.join(outdeg, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("outdeg")).as("share"))
      .localCheckpoint(false)
    // src-node set hoisted out of the loop (it was re-derived per
    // iteration inside the dangling-mass anti-join)
    val srcNodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count().toDouble
    // lazy checkpoints throughout (round 17): each still truncates the
    // plan — iteration N never replays steps 1..N-1 — but materialization
    // rides the caller's one action instead of one eager job per step
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(false)
    var it = 0
    while (it < iterations) {
      // dangling mass: rank stranded on nodes with no out-edges is
      // redistributed uniformly (the standard correction; dropping it
      // deflates every rank by the stranded fraction per step)
      val dang = ranks.join(srcNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("m"))
      val contrib = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("share")).as("c"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("m") / n))
            .as("rank"))
        .localCheckpoint(false)
      it += 1
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
