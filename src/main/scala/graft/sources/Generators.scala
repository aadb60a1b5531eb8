package graft.sources

import java.time.Instant

import scala.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{CatalogEvent, ShoppingCartEvent}

/** Deterministic event generators — the Spark-first recast of the
  * reference's custom `SourceFunction`s (S5-S8,
  * reference ShoppingCartEventsGenerator.scala:43-191).
  *
  * The reference emits one random event per `sleepMillisPerEvent` with
  * event time = `baseInstant + id` seconds; we generate the identical
  * sequence eagerly with a seeded RNG (reproducible across runs/cluster
  * sizes) and expose it as a batch Dataset or feed it through a
  * `MemoryStream` for streaming tests. Per-source watermark emission
  * (reference ShoppingCartEventsGenerator.scala:142-144) maps to
  * `withWatermark` on the resulting stream (SURVEY.md §2.6 M5).
  */
object Generators {

  private val users = Vector("Bob", "Alice", "Sam", "Tom", "Rob")

  /** Deterministic twin of `ShoppingCartEventsGenerator`
    * (reference ShoppingCartEventsGenerator.scala:63-76): `n` add-events,
    * event time = base + id seconds, user drawn seeded-uniform, qty 0-9.
    */
  def shoppingCartEvents(n: Int, base: Instant, seed: Long = 42L,
      skuPrefix: String = "", generateRemoved: Boolean = false): Seq[ShoppingCartEvent] = {
    val rnd = new Random(seed)
    (0 until n).map { id =>
      val kind = if (generateRemoved && rnd.nextBoolean()) "removed" else "add"
      ShoppingCartEvent(
        kind,
        users(rnd.nextInt(users.size)),
        skuPrefix + new java.util.UUID(rnd.nextLong(), rnd.nextLong()).toString,
        rnd.nextInt(10),
        base.plusSeconds(id.toLong))
    }
  }

  /** Deterministic twin of `CatalogEventsGenerator`
    * (reference ShoppingCartEventsGenerator.scala:177-191).
    */
  def catalogEvents(n: Int, base: Instant, seed: Long = 43L): Seq[CatalogEvent] = {
    val rnd = new Random(seed)
    (0 until n).map { id =>
      CatalogEvent(
        users(rnd.nextInt(users.size)),
        base.plusSeconds(id.toLong),
        new java.util.UUID(rnd.nextLong(), rnd.nextLong()).toString)
    }
  }

  /** S1/S2/S9: `fromElements`/`fromCollection` → createDataset. */
  def fromCollection[T: org.apache.spark.sql.Encoder](spark: SparkSession, xs: Seq[T]): Dataset[T] =
    spark.createDataset(xs)

  /** S3: `fromSequence(a, b)` → spark.range (distributed, no driver list). */
  def fromSequence(spark: SparkSession, from: Long, to: Long): Dataset[java.lang.Long] =
    spark.range(from, to + 1).as[java.lang.Long](org.apache.spark.sql.Encoders.LONG)

  /** S4: socket text stream — `socketTextStream(host, port)` →
    * Structured Streaming socket source (untyped line stream).
    */
  def socketLines(spark: SparkSession, host: String, port: Int) =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Streaming twin of S5-S8: a rate-source-driven shopping cart stream.
    * Events are derived arithmetically from the rate source's `value`
    * (NOT the same sequence as the seeded batch generator — same shape,
    * different draw). Use for demos; tests prefer MemoryStream.
    */
  def shoppingCartStream(spark: SparkSession, base: Instant, rowsPerSecond: Int = 10) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        lit("add").as("eventType"),
        element_at(typedLit(users), (pmod(col("value"), lit(users.size)) + 1).cast("int"))
          .as("userId"),
        concat(lit("sku_"), col("value")).as("sku"),
        pmod(col("value"), lit(10)).cast("int").as("quantity"),
        (lit(base.getEpochSecond) + col("value")).cast("timestamp").as("time"))
      .as[ShoppingCartEvent]
  }
}
