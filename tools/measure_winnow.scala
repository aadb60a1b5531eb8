// Winnowing vs fixed-stride span dedup on SHIFTED copies.
// Run: spark-shell --master 'local[16]' --driver-memory 6g \
//   --driver-class-path target/scala-2.13/classes -I tools/measure_winnow.scala
// Corpus: 2000 base docs of 60 tokens; each gets one plagiarized twin that
// embeds the base doc's tokens 25..44 (a 20-token run) at a random offset
// inside otherwise-unique filler. Ground truth: pair (base, twin).
import org.apache.spark.sql.functions._
val n = 2000
val rnd = new scala.util.Random(13)
val rows = (0 until n).flatMap { i =>
  val base = (0 until 60).map(j => s"w${i}_$j")
  val run = base.slice(25, 45)
  val off = rnd.nextInt(30) // shift NOT aligned to any fixed stride
  val filler = (0 until 60).map(j => s"f${i}_$j")
  val twin = filler.take(off) ++ run ++ filler.drop(off).take(60 - off - run.size)
  Seq((i.toLong, base.mkString(" ")), (i.toLong + 1000000L, twin.mkString(" ")))
}
val docs = spark.createDataFrame(rows).toDF("doc_id", "text").cache()
docs.count()
def truth(a: Long, b: Long) = (a % 1000000L) == (b % 1000000L) && a != b
// fixed-stride span dedup (20-token spans, same length as the run):
// a shifted copy only matches if the run lands on a span boundary
val spPairs = {
  val sp = graft.ops.Dedup.spanFingerprints(docs, spanTokens = 20)
  sp.as("a").join(sp.as("b"), "fp").where(col("a.doc_id") < col("b.doc_id")).select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
}
val spHits = spPairs.count(p => truth(p._1, p._2))
// winnowing pairs, guarantee window w+k-1 = 6 << 20-token run
val wnPairs = graft.ops.Dedup.winnowPairs(docs, k = 3, w = 4, minShared = 2).select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
val wnHits = wnPairs.count(p => truth(p._1, p._2))
println(s"MEASURE span-dedup: recall ${spHits.toDouble / n} (${spHits}/$n), false pairs ${spPairs.length - spHits}")
println(s"MEASURE winnowing:  recall ${wnHits.toDouble / n} (${wnHits}/$n), false pairs ${wnPairs.length - wnHits}")
sys.exit(0)
