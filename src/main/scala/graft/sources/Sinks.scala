package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Sinks (SURVEY.md §2.2, K1-K6).
  *
  * Batch: `DataFrameWriter` covers writeAsText/writeAsCsv/collect.
  * Streaming: checkpointed file sink = the reference's exactly-once
  * `StreamingFileSink` (reference BuiltIn.scala:200-226) — Spark rolls
  * files per micro-batch with a write-ahead log + idempotent commits,
  * same guarantee, trigger interval playing the rolling-policy role.
  */
object Sinks {

  /** K1: `writeAsText` — one dir per sink, one file per partition. */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)

  /** K2: `writeAsCsv(path, OVERWRITE)`. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(path)

  /** K3: `print()` — console sink. */
  def printSink(df: DataFrame, rows: Int = 20): Unit = df.show(rows, false)

  /** K4: `addSink(lambda)` — arbitrary per-record side effect. */
  def foreachSink[T](ds: Dataset[T])(f: T => Unit): Unit = ds.foreach(f)

  /** K6: `executeAndCollect()`. */
  def collectRows(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** K5: exactly-once rolling file sink (streaming). Caller starts the
    * returned writer; `trigger` ≈ the reference's rollover interval.
    */
  def rollingFileSink(df: DataFrame, path: String, checkpoint: String,
      format: String = "csv", triggerMs: Long = 1000L): DataStreamWriter[Row] =
    df.writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))

  /** Streaming memory sink for tests (`executeAndCollect` streaming twin). */
  def memorySink(df: DataFrame, name: String): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name)

  /** Range-clustered parquet write — the layout-management half of a
    * 100 TB pipeline. `repartitionByRange` gives every output file a
    * DISJOINT value range on the cluster keys and `sortWithinPartitions`
    * orders rows inside each file, so parquet min/max statistics let any
    * downstream range or point predicate skip whole files and row groups
    * instead of scanning the corpus (beyond what predicate pushdown alone
    * buys on a randomly-laid-out table). Range boundaries come from a
    * reservoir sample of the keys (Spark's range partitioner), so skew
    * surfaces as uneven file sizes, not failures. The sort also
    * maximizes parquet RLE/dictionary efficiency on the cluster keys —
    * clustered tables are usually smaller, not just faster to probe.
    * One shuffle, executed once at write time, amortized over every
    * future scan: the write-side complement of [[graft.ops.IndexTables]]
    * (which buys hash-bucketed JOIN locality; this buys range-scan
    * pruning).
    */
  def writeRangeClustered(df: DataFrame, path: String, nFiles: Int,
      clusterCols: Seq[String]): Unit = {
    require(clusterCols.nonEmpty, "at least one cluster column required")
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }
}
