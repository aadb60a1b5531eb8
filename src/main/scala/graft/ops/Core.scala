package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core scalar transforms and keyed aggregation (SURVEY.md §2.3–2.4).
  *
  * Reference surface re-expressed Spark-first: lambdas/`MapFunction`s become
  * codegen'd Catalyst expressions (`when`/`split`/`explode`/…), `keyBy` +
  * reduce/sum become `groupBy().agg()` with map-side partial aggregation.
  * None of these use Scala closures/UDFs, so every pipeline stays inside
  * WholeStageCodegen and all filters/projections push down to the scan.
  */
object Core {

  /** THE deterministic pseudo-uniform offset in [0, bound): the id folded
    * mod 1e6+3 (keeps every product far from Long overflow for any id),
    * scaled by a co-prime multiplier, pmod'd into the bound — pmod, not %,
    * so negative ids land in range instead of producing a negative slice
    * length downstream. One definition shared by
    * [[Packing.fimTransform]]'s cut points and
    * [[Multimodal.interleaveMedia]]'s insertion offsets (their DuckDB
    * oracles mirror the same arithmetic; for non-negative ids pmod ≡ %,
    * which is what the oracle SQL writes).
    */
  private[ops] def foldedOffset(id: org.apache.spark.sql.Column, mult: Long,
      bound: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(id.cast("long"), lit(1000003L)) * mult, bound.cast("long"))

  /** Fizz-buzz pattern-match transform over a sequence source.
    * Reference: map over `fromSequence(1, 100)` —
    * reference BuiltIn.scala:161-170 (T9, S3).
    */
  def fizzbuzz(spark: SparkSession, n: Long = 100): DataFrame = {
    spark.range(1, n + 1).toDF("n").select(
      col("n"),
      when(col("n") % 15 === 0, "fizzbuzz")
        .when(col("n") % 3 === 0, "fizz")
        .when(col("n") % 5 === 0, "buzz")
        .otherwise(col("n").cast("string")).as("output"))
  }

  /** The reference's committed golden pipeline: elements ×10, duplicated,
    * keep even — reference BuiltIn.scala:53-75 and
    * myDataStreamX10WithDuplicatesEven.out (T1, T4, T7).
    * Generalized over a range source; duplication is `explode(array_repeat)`
    * (a Catalyst Generator — no UDF, no shuffle).
    */
  def mapDuplicateFilterEven(spark: SparkSession, n: Long = 4): DataFrame =
    spark.range(1, n + 1).toDF("n")
      .select((col("n") * 10).as("x"))
      .select(explode(array_repeat(col("x"), 2)).as("x"))
      .where(col("x") % 2 === 0)

  /** ASCII tokenization — the reference's exact form:
    * `toLowerCase.split("\\W+")` + nonEmpty —
    * reference SocketTextStreamWordCount.scala:60, Playground.scala:17 (T10).
    * Kept verbatim for the reference-fidelity word count; every
    * LLM-pipeline operator uses [[tokensUni]] instead (this form yields an
    * EMPTY token array for any non-Latin-script document).
    * Returns an `array<string>` column expression (codegen'd, no UDF).
    */
  def tokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Script-aware tokenization: split on runs of anything that is not a
    * Unicode letter or decimal digit (`\p{L}` / `\p{Nd}`), after Unicode
    * lowercasing. CJK/Cyrillic/Arabic/Greek text tokenizes into real tokens
    * instead of the ASCII form's empty array — the difference between a
    * multilingual 100 TB corpus being curated and being silently destroyed
    * (an empty token array fingerprints every non-Latin document to the
    * same md5). Java's `\p{L}` and DuckDB/RE2's `\p{L}` agree on these
    * categories, so the DuckDB oracle mirrors this with the same class.
    */
  def tokensUni(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(lower(text), "[^\\p{L}\\p{Nd}]+"), t => t =!= "")

  /** Word count — the reference's flagship query
    * (SocketTextStreamWordCount.scala:59-63, Playground.scala:11-22).
    * Batch form over a text column; streaming twin in graft.streaming.
    * Scale: explode is pipelined (narrow); the single shuffle is the
    * word-key hash aggregation with map-side partial counts.
    */
  def wordCount(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").count().withColumnRenamed("count", "cnt")

  /** Per-key running count — keyed aggregation (A1/A4,
    * reference SocketTextStreamWordCount.scala:62-63, KeyedState.scala:57-59).
    */
  def keyedCount(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).count().withColumnRenamed("count", "cnt")

  /** Per-key reduce (sum) — `keyed.reduce(_ + _)` (A3,
    * reference BuiltIn.scala:300-304). Relational form: partial+final
    * HashAggregate, identical merge semantics to Flink's ReduceFunction.
    */
  def keyedSum(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key)).agg(round(sum(col(valueCol)), 4).as("total"))

  /** Quantity-expansion flatMap: emit one row per unit of quantity
    * (RichFlatMapFunction exercise, reference RichFunctions.scala:182-194,
    * T6). `explode(array_repeat(...))` keeps it inside codegen.
    */
  def expandByQuantity(df: DataFrame, tag: String, qty: String): DataFrame =
    df.select(explode(array_repeat(col(tag), col(qty).cast("int"))).as("item"))
      .groupBy("item").count().withColumnRenamed("count", "cnt")

  /** TPC-H Q1-shaped pricing summary: the canonical keyed multi-aggregate
    * (A3/A5 analogue over the lineitem testdata). Sums are rounded for
    * cross-engine float stability; partial aggregation makes this a single
    * shuffle of (flag,status) — 4 groups — at any scale.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Rich-map style derived-column pipeline with filter pushdown: computed
    * charge per line item (T1/T3 relational form). The shipdate filter and
    * 4-column projection reach the parquet scan (PushedFilters/ReadSchema).
    */
  def chargePerLine(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // no rounding: both engines compute the identical IEEE double, and
        // rounding a value whose exact decimal form ends in "…50" is
        // engine-dependent (boundary ties) — raw doubles compare exactly
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("charge"))
}
