// Round-14: capture the sf0.01 greedy-shift decisions for the
// q_ter_shift pinned-literal oracle (the q_bpe_apply doctrine: the
// iterative argmin's DECISIONS are pinned; shift application + the edit
// DP replay mechanically in DuckDB, so kernel drift flips the row red
// instead of silently diverging).
// Rebuilds the q_ter_shift fixture exactly: evalPairs' ref/cand_sub
// (sub every 3rd token, drop every 5th), tokenized, sliced to 32,
// cand rotated left by 8 when the slice has >= 16 tokens.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --driver-memory 4g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=8 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/pin_ter_r14.scala
import graft.Tables
import graft.functions.ArrayKernels
import graft.ops.Core
import org.apache.spark.sql.functions._

val pairs = {
  val docs = Tables.documents(spark, "/root/testdata/sf0.01")
  val t = Core.tokensUni(col("text"))
  val mut = transform(t, (x, i) =>
    when((i + 1) % 3 === 0, lit("xx")).otherwise(x))
  val candSub = filter(mut, (_, i) => (i + 1) % 5 =!= 0)
  val ct = slice(candSub, 1, 32)
  val rot = when(size(ct) >= 16,
    concat(slice(ct, lit(9), size(ct) - 8), slice(ct, 1, 8))).otherwise(ct)
  val rows = docs
    .select(col("doc_id"), slice(t, 1, 32).as("rt"), rot.as("ct"))
    .where(size(col("rt")) > 0)
    .collect()
  rows.map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[String](2)))
    .sortBy(_._1)
}

val traces = pairs.map { case (id, rt, ct2) =>
  val (sh, n, e) = ArrayKernels.terShiftTrace(ct2, rt)
  (id, sh, n, e)
}

val summary = {
  val withShifts = traces.filter(_._2.nonEmpty)
  val maxSteps = (0 +: traces.map(_._2.length).toSeq).max
  val nTriples = traces.map(_._2.length).sum
  val hist = traces.groupBy(_._2.length).view.mapValues(_.length)
    .toMap.toSeq.sorted
  s"docs=${traces.length} withShifts=${withShifts.length} " +
    s"maxSteps=$maxSteps triples=$nTriples shiftHist=$hist"
}
println(summary)

val pinBlock = {
  // (doc_id, step(1-based), start, len, ins) — 0-indexed start/ins as
  // the kernel records them; the SQL converts to 1-indexed positions
  val lines = traces.filter(_._2.nonEmpty).flatMap { case (id, sh, _, _) =>
    sh.zipWithIndex.map { case ((s, l, p), i) =>
      s"    ($id, ${i + 1}, $s, $l, $p)"
    }
  }
  lines.mkString(",\n")
}
println("PIN_BEGIN")
println(pinBlock)
println("PIN_END")
System.exit(0)
