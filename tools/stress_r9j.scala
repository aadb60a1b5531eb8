// Round-9j stress rows: URL canonicalization / domain rollups / domain
// cap, license + code-signal scans (50k docs, x10 copies) and the
// Z-order key + locality audit over the full sf0.1 lineitem (600k rows).
// Run with: spark-shell --master 'local[16]' --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes -I tools/stress_r9j.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val docs = spark.read.parquet(d + "/documents.parquet")
val big = ((0 until 10).map(i =>
    docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
  .reduce(_ union _).localCheckpoint())
println("docs: " + big.count())

// deterministic URL synthesis (the q_url_norm injection at 50k)
val urls = big.select(col("doc_id"), col("n_chars"), concat(
  when(col("doc_id") % 4 === 0, lit("HTTPS://WWW.")).otherwise(lit("https://")),
  col("source"),
  when(col("doc_id") % 3 === 0, lit(".co.uk")).otherwise(lit(".org")),
  when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
  lit("/p/"), (col("doc_id") % 50).cast("string"),
  when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
  when(col("doc_id") % 2 === 0, lit("?utm_source=feed&b=2&a=1"))
    .otherwise(lit("?b=2&a=1")),
  when(col("doc_id") % 6 === 0, lit("#frag")).otherwise(lit("")))
  .as("url")).localCheckpoint()

time("50k-url-canonical")(
  graft.ops.WebCuration.urlCanonical(urls, "doc_id", "url").count())
time("50k-domain-stats")(
  graft.ops.WebCuration.domainStats(urls, "doc_id", "url", "n_chars")
    .count())
time("50k-domain-cap-100")(
  graft.ops.WebCuration.domainCap(urls, "doc_id", "url", 100).count())

// license + code scans (scan-stage regexp batteries)
val lic = big.select(col("doc_id"), concat(col("text"),
  when(col("doc_id") % 8 === 0, lit(" SPDX-License-Identifier: MIT"))
    .otherwise(lit("")),
  when(col("doc_id") % 12 === 0,
    lit(" Licensed under the Apache License, Version 2.0"))
    .otherwise(lit(""))).as("text"))
time("50k-license-scan")(graft.ops.TextAnalysis.licenseScan(lic).count())
val codey = big.select(col("doc_id"), concat(col("text"),
  when(col("doc_id") % 9 === 0,
    lit("\nfunction f(x) {\n  var y = x + 1;\n  return y;\n}"))
    .otherwise(lit(""))).as("text"))
time("50k-code-signals")(graft.ops.TextAnalysis.codeSignals(codey).count())

// Z-order over the full sf0.1 lineitem: key computation + bucket audit
val li = spark.read.parquet(d + "/lineitem.parquet").localCheckpoint()
println("lineitem: " + li.count())
time("600k-zorder-key")(
  graft.ops.Partitioning.zOrdered(li, Seq("l_partkey", "l_suppkey"), 8)
    .agg(max("zval")).collect().head.getLong(0))
time("600k-zorder-audit-64")(
  graft.ops.Partitioning.zOrderAudit(li, Seq("l_partkey", "l_suppkey"),
    8, 64).count())
sys.exit(0)
