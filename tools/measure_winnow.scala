// Winnowing vs fixed-stride span dedup on SHIFTED copies.
// Run: spark-shell --master 'local[16]' --driver-memory 6g \
//   --driver-class-path target/scala-2.13/classes -I tools/measure_winnow.scala
// Corpus: 2000 base docs of 60 single-word tokens (no separators the
// tokenizer would split); each gets a plagiarized twin embedding the
// base doc's tokens 20..39 — exactly base span #2 of the stride-20 grid,
// the BEST case for fixed-stride span dedup — at a random twin offset
// 0..29. Fixed-stride span dedup can only match when the twin offset is
// also a span boundary (off = 0 or 20 → expected recall 2/30 ≈ 0.067);
// winnowing's guarantee (shared run 20 ≥ w+k−1 = 6) is offset-free.
// Ground truth: pair (base i, twin i).
import org.apache.spark.sql.functions._
val n = 2000
val rnd = new scala.util.Random(13)
val rows = (0 until n).flatMap { i =>
  val base = (0 until 60).map(j => s"w${i}x$j")
  val run = base.slice(20, 40)
  val off = rnd.nextInt(30)
  val filler = (0 until 60).map(j => s"f${i}x$j")
  val twin = filler.take(off) ++ run ++ filler.drop(off).take(60 - off - run.size)
  Seq((i.toLong, base.mkString(" ")), (i.toLong + 1000000L, twin.mkString(" ")))
}
val docs = spark.createDataFrame(rows).toDF("doc_id", "text").cache()
docs.count()
def truth(a: Long, b: Long) = (a % 1000000L) == (b % 1000000L) && a != b
val spPairs = {
  val sp = graft.ops.Dedup.spanFingerprints(docs, spanTokens = 20)
  sp.as("a").join(sp.as("b"), "fp").where(col("a.doc_id") < col("b.doc_id")).select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
}
val spHits = spPairs.count(p => truth(p._1, p._2))
val wnPairs = graft.ops.Dedup.winnowPairs(docs, k = 3, w = 4, minShared = 2).select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
val wnHits = wnPairs.count(p => truth(p._1, p._2))
println(s"MEASURE span-dedup: recall ${spHits.toDouble / n} (${spHits}/$n), false pairs ${spPairs.length - spHits}")
println(s"MEASURE winnowing:  recall ${wnHits.toDouble / n} (${wnHits}/$n), false pairs ${wnPairs.length - wnHits}")
sys.exit(0)
