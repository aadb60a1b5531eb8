// Round-13: capture the sf0.01 IVF k=16 centroids for the
// q_cluster_sizes pinned-literal oracle (the PQ_CODEBOOK_PINNED
// doctrine: training stays the live path; the oracle replays argmax
// assignment under the FIXED centroids, so trainer drift flips the row
// red instead of silently diverging).
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --driver-memory 4g \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=8 \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/pin_ivf_r13.scala
import graft.Tables
import graft.ops.Similarity

val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
val cents = Similarity.ivfCentroids(emb, 16)
println("CENTROIDS_BEGIN")
println(cents.map(c => "    Array(" + c.mkString(", ") + ")")
  .mkString("  Array(\n", ",\n", "))"))
println("CENTROIDS_END")
System.exit(0)
