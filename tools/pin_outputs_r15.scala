// Round-15 second pin recorder: sf0.01 outputs of the four remaining
// convertible exemptions, printed as literal lines for OutputPins.scala.
//   q_bpe_learn      "rank|left|right|cnt"       20 merge decisions
//   q_unigram_learn  "rank|piece|cnt|logp"       EM-trained vocab (logp
//                    via Double.toString — full precision, e0-replayed)
//   q_hll            "event_type|approx_users"   HLL++ estimates (cnt
//                    replays live)
//   q_compression    "doc_id|deflate_ratio"      DEFLATE ratios
// Run: /opt/spark/bin/spark-shell --master 'local[8]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=8 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/pin_outputs_r15.scala
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.Tables

val docs = Tables.documents(spark, "/root/testdata/sf0.01")
println("=== BPE_LEARN ===")
(TextAnalysis.bpeLearn(docs, nMerges = 20).orderBy("rank").collect()
  .foreach(r => println(s"${r.getInt(0)}|${r.getString(1)}|${r.getString(2)}|${r.getLong(4)}")))
println("=== UNIGRAM_LEARN ===")
(TextAnalysis.unigramLearn(docs, vocabSize = 256, emIters = 2)
  .orderBy("rank").collect()
  .foreach(r => println(s"${r.getInt(0)}|${r.getString(1)}|${r.getLong(2)}|" +
    java.lang.Double.toString(r.getDouble(3)))))
println("=== HLL ===")
(Tables.events(spark, "/root/testdata/sf0.01").groupBy("event_type")
  .agg(approx_count_distinct(col("user_id")).as("u")).orderBy("event_type")
  .collect().foreach(r => println(s"${r.getString(0)}|${r.getLong(1)}")))
println("=== COMPRESSION ===")
(TextAnalysis.compressionScores(docs).orderBy("doc_id").collect()
  .foreach(r => println(s"${r.getLong(0)}|" +
    java.lang.Double.toString(r.getDouble(1)))))
println("=== END ===")
sys.exit(0)
