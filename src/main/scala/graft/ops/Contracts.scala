package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract enforcement for delivered tables — the ingest-time twin
  * of the corpus observability stack (drift watches distributions,
  * anomaly watches volumes, THIS watches row-level invariants): each
  * rule is a boolean Column over the row, and the report says how many
  * rows break it and where to start looking. The privacy counterpart
  * ([[kAnonymity]]) reports quasi-identifier cells too small to publish.
  */
object Contracts {

  /** One row per rule: violations (predicate FALSE or NULL — an
    * unevaluable contract is a broken contract), total rows, and the
    * smallest violating id as the repro pointer. ALL rules evaluate in
    * ONE scan (a single aggregate projects every rule's flag; the rows
    * are stacked after) — N rules never cost N passes over a 100 TB
    * table.
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)],
      idCol: String): DataFrame = {
    require(rules.nonEmpty, "Contracts.violations: need at least one rule")
    val aggs = rules.zipWithIndex.flatMap { case ((_, p), i) =>
      val bad = !coalesce(p, lit(false))
      Seq(sum(bad.cast("long")).as(s"v$i"),
        min(when(bad, col(idCol))).as(s"b$i"))
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"),
        coalesce(col(s"v$i"), lit(0L)).as("n_violations"),
        col(s"b$i").as("first_bad_id"), col("n_rows").as("n_rows"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.n_violations"), col("r.first_bad_id"),
        col("r.n_rows"))
  }

  /** k-anonymity report over quasi-identifier columns: how many distinct
    * QI cells exist, how many hold fewer than `k` rows, and how many
    * ROWS sit in those re-identifiable cells — the publish/suppress
    * gate for releasing per-group statistics. One map-side-combined
    * groupBy over the QI tuple, then K-cell-sized algebra; null QI
    * values form their own cells (they are an identifier value too).
    * [[Scrub.kAnonymityAudit]] is the per-group detail twin (which
    * cells to suppress); [[Scrub.lDiversityAudit]] adds the
    * sensitive-value homogeneity check.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty && k >= 2,
      s"kAnonymity: need QI columns and k >= 2, got $quasiIds / $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_cells"),
        sum((col("cnt") < k).cast("long")).as("n_small_cells"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        min(col("cnt")).as("min_cell"))
  }

  /** Numeric column profiler — the "what is in this table" report a data
    * handoff leads with (the Deequ/Great Expectations profile): per
    * column, non-null count, null count, distinct count, min/max, mean,
    * sample stddev, and exact p50/p95, one output row per column.
    *
    * EVERY column's non-distinct metrics compute in ONE aggregate pass
    * (the [[violations]] doctrine — N columns never cost N scans); the
    * one-row wide result unpivots to rows driver-free via explode.
    * `exact = true` computes each `count(DISTINCT)` as its OWN
    * single-distinct two-phase aggregate over a one-column projection,
    * cross-joined onto the one-row profile — NOT inside the main
    * aggregate, where k exact distincts force an Expand that replicates
    * every scan row k+1× and drags the exact-percentile buffers through
    * the expanded shuffle (measured 21.9 → ~2 s at sf0.1). Each extra
    * pass prunes to a single parquet column, so at 100 TB the k narrow
    * column scans are far cheaper than one k+1× Expand of full rows.
    * `exact = false` keeps HLL++ `approx_count_distinct` inline (one
    * scan, no expand, ±2 % default) and treats n_distinct as an
    * estimate. Exact `percentile` is the oracle-parity choice;
    * production swaps `approx_percentile`.
    */
  def tableProfile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "Contracts.tableProfile: need at least one column")
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("double")
      (if (exact) Nil
       else Seq(approx_count_distinct(col(c)).as(s"nd_$c"))) ++ Seq(
        count(col(c)).as(s"n_$c"),
        sum(col(c).isNull.cast("long")).as(s"null_$c"),
        round(min(d), 4).as(s"min_$c"),
        round(max(d), 4).as(s"max_$c"),
        round(avg(d), 4).as(s"mean_$c"),
        round(stddev_samp(d), 4).as(s"std_$c"),
        round(expr(s"percentile(CAST($c AS DOUBLE), 0.5)"), 4).as(s"p50_$c"),
        round(expr(s"percentile(CAST($c AS DOUBLE), 0.95)"), 4).as(s"p95_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // exact path: one single-distinct aggregate per column (partial
    // groupBy(col) map-side combine, then count — no Expand), each a
    // 1-row frame broadcast-cross-joined onto the profile row.
    val one = if (!exact) wide else cols.foldLeft(wide) { (acc, c) =>
      acc.crossJoin(df.agg(countDistinct(col(c)).as(s"nd_$c")))
    }
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"n_$c").as("n"),
        coalesce(col(s"null_$c"), lit(0L)).as("n_null"),
        col(s"nd_$c").as("n_distinct"), col(s"min_$c").as("min"),
        col(s"max_$c").as("max"), col(s"mean_$c").as("mean"),
        col(s"std_$c").as("std"), col(s"p50_$c").as("p50"),
        col(s"p95_$c").as("p95"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
