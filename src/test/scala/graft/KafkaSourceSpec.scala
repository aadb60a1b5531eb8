package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Generators

/** Kafka source twin (BASELINE north star: "Kafka/socket sources").
  *
  * The sandbox ships no spark-sql-kafka connector jar, so the live reader
  * is covered by the documented negative test; the value→event projection
  * (the part that is this library's code) is exercised against the exact
  * Kafka wire schema, batch and streaming. SocketExtensionsSpec covers the
  * live-TCP transport representative.
  */
class KafkaSourceSpec extends SparkSpec {
  import spark.implicits._

  // the Kafka source wire schema, as produced by the connector
  private def wireRow(value: String, ts: Timestamp) =
    (null.asInstanceOf[Array[Byte]], value.getBytes("UTF-8"), "carts", 0, 0L, ts, 0)

  private val wireCols =
    Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")

  test("kafka value projection decodes JSON payloads to typed cart events") {
    val ts = Timestamp.valueOf("2022-02-02 00:00:10")
    val rows = Seq(
      wireRow("""{"eventType":"add","userId":"alice","sku":"s1","quantity":2,"time":"2022-02-02T00:00:01Z"}""", ts),
      // sparse payload: type/quantity default, event time falls back to broker ts
      wireRow("""{"userId":"bob","sku":"s2"}""", ts),
      // malformed payloads: dropped, never fabricated into phantom events
      wireRow("not json at all", ts),
      wireRow("""{"quantity":9}""", ts))
    val kafka = rows.toDF(wireCols: _*)
    val got = Generators.kafkaValueToCartEvents(kafka).collect()
      .map(e => (e.eventType, e.userId, e.sku, e.quantity, e.time)).toSeq
    assert(got.size == 2, got.toString)
    assert(got.contains(("add", "alice", "s1", 2,
      java.time.Instant.parse("2022-02-02T00:00:01Z"))))
    assert(got.contains(("add", "bob", "s2", 0, ts.toInstant)))
  }

  test("kafka projection composes with streaming (MemoryStream on the wire schema)") {
    val in = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)](
      50, spark, None)
    val events = Generators.kafkaValueToCartEvents(in.toDF().toDF(wireCols: _*))
    val counts = events.groupBy("userId").agg(sum("quantity").as("q"))
    val q = counts.writeStream.format("memory").queryName("kafka_proj")
      .outputMode("complete").start()
    try {
      val ts = Timestamp.valueOf("2022-02-02 00:00:10")
      in.addData(
        wireRow("""{"userId":"alice","sku":"a","quantity":3}""", ts),
        wireRow("""{"userId":"alice","sku":"b","quantity":4}""", ts))
      q.processAllAvailable()
      val got = spark.table("kafka_proj").as[(String, Long)].collect().toMap
      assert(got("alice") == 7L)
    } finally q.stop()
  }

  test("live kafka reader: documented sandbox limit (no connector jar)") {
    val e = intercept[Exception] {
      Generators.kafkaCartEvents(spark, "localhost:9092", "carts")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }
}
