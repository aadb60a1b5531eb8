package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Co-located bucketed joins (the at-scale alternative to shuffling a big
  * join) and stream-stream joins (J2/J3 streaming twins).
  */
class BucketingStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    df.write.mode("overwrite").option("path", s"$wh/a")
      .bucketBy(8, "k").sortBy("k").saveAsTable("bucketed_a")
    df.write.mode("overwrite").option("path", s"$wh/b")
      .bucketBy(8, "k").sortBy("k").saveAsTable("bucketed_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing supplies the hash distribution: no Exchange on either side
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000L * 20) // 50 keys × 20 × 20 pairs
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def ts(s: Double) = new Timestamp((s * 1000).toLong)

  test("J3 streaming stream-stream interval join with watermarks " +
      "(HandlingMultipleStreams.scala:131-210)") {
    val left = MemoryStream[(String, Timestamp, Long)](30, spark, None)
    val right = MemoryStream[(String, Timestamp, Long)](31, spark, None)
    val l = left.toDF().toDF("k", "lts", "l_id").withWatermark("lts", "0 seconds")
    val r = right.toDF().toDF("k2", "rts", "r_id").withWatermark("rts", "0 seconds")
    val joined = l.join(r,
      col("k") === col("k2") &&
        col("rts") > col("lts") - expr("INTERVAL 2 SECONDS") &&
        col("rts") < col("lts") + expr("INTERVAL 2 SECONDS"))
      .select(col("l_id"), col("r_id"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      left.addData(("u", ts(10), 1L))
      right.addData(("u", ts(11), 2L), ("u", ts(13), 3L), ("x", ts(10), 4L))
      q.processAllAvailable()
      left.addData(("u", ts(30), 5L)); right.addData(("u", ts(30.5), 6L))
      q.processAllAvailable()
      val got = spark.table("ssj").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 2L)))  // within ±2s, same key
      assert(!got.contains((1L, 3L))) // outside the interval
      assert(!got.contains((1L, 4L))) // wrong key
      assert(got.contains((5L, 6L)))  // second batch pair
    } finally q.stop()
  }

  test("stream-static enrichment join: broadcast dim against a stream") {
    val in = MemoryStream[(String, Long)](34, spark, None)
    val dim = Seq(("click", "interactive"), ("view", "passive")).toDF("et", "kind")
    val enriched = in.toDF().toDF("et", "v")
      .join(broadcast(dim), "et") // dim broadcast: no stream-side shuffle
      .groupBy("kind").count()
    val q = enriched.writeStream.format("memory").queryName("ssenrich")
      .outputMode("complete").start()
    try {
      in.addData(("click", 1L), ("view", 2L), ("click", 3L), ("scroll", 4L))
      q.processAllAvailable()
      val got = spark.table("ssenrich").as[(String, Long)].collect().toMap
      assert(got == Map("interactive" -> 2L, "passive" -> 1L)) // scroll: no dim row
    } finally q.stop()
  }

  test("J2 streaming windowed equi-join: both sides bucketed to the same window") {
    val left = MemoryStream[(String, Timestamp)](32, spark, None)
    val right = MemoryStream[(String, Timestamp)](33, spark, None)
    val l = left.toDF().toDF("k", "lts").withWatermark("lts", "0 seconds")
      .select(col("k"), window(col("lts"), "10 seconds")("start").as("w"), col("lts"))
    val r = right.toDF().toDF("k2", "rts").withWatermark("rts", "0 seconds")
      .select(col("k2"), window(col("rts"), "10 seconds")("start").as("w2"), col("rts"))
    val joined = l.join(r, col("k") === col("k2") && col("w") === col("w2"))
      .select(col("k"), col("w"))
    val q = joined.writeStream.format("memory").queryName("swj")
      .outputMode("append").start()
    try {
      left.addData(("u", ts(1)), ("u", ts(15)))
      right.addData(("u", ts(5)), ("v", ts(6)))
      q.processAllAvailable()
      val got = spark.table("swj").as[(String, Timestamp)].collect().toSeq
      assert(got.contains(("u", ts(0))))          // co-windowed pair [0,10)
      assert(!got.exists(_._2 == ts(10)))         // 15 has no partner window
      assert(!got.exists(_._1 == "v"))            // unmatched key
    } finally q.stop()
  }
}
