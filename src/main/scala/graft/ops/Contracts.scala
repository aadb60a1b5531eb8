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
}
