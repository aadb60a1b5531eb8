package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** Rich-function lifecycle (SURVEY.md §2.3 T3, §2.10 X8): Flink's
  * `RichMapFunction.open()/close()` + per-record transform
  * (reference RichFunctions.scala:63-157).
  *
  * Spark-first form: `mapPartitions` — `open()` runs once per partition
  * before the first element, `close()` after the last (the same
  * once-per-parallel-instance contract as Flink's rich lifecycle, which the
  * reference demonstrates prints once per subtask,
  * reference RichFunctions.scala:135-152). The runtime-context jobId the
  * reference reads (reference RichFunctions.scala:118-133) maps to the
  * Spark application id, exposed via [[RuntimeInfo]] in
  * [[Rich.mapWithRuntimeContext]].
  */
object Rich {

  /** What Flink's `getRuntimeContext` exposes inside a rich function,
    * Spark-side: the job identity (applicationId — readable on executors
    * through the task-local SparkEnv) and the parallel-subtask analogue
    * (partition id). Reference RichFunctions.scala:118-133 prints exactly
    * these two from `open()`.
    */
  final case class RuntimeInfo(appId: String, partitionId: Int)

  def mapWithLifecycle[T, U: Encoder](ds: Dataset[T])(
      open: Int => Unit, f: T => U, close: Int => Unit): Dataset[U] =
    mapWithRuntimeContext(ds)(
      ctx => open(ctx.partitionId), (_, t) => f(t), ctx => close(ctx.partitionId))

  def mapWithRuntimeContext[T, U: Encoder](ds: Dataset[T])(
      open: RuntimeInfo => Unit, f: (RuntimeInfo, T) => U,
      close: RuntimeInfo => Unit): Dataset[U] =
    ds.mapPartitions { it =>
      val ctx = RuntimeInfo(
        org.apache.spark.SparkEnv.get.conf.getAppId,
        org.apache.spark.TaskContext.getPartitionId())
      open(ctx)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; close(ctx) }
      // guarantee close() even when the consumer stops early (limit/take)
      // or the task fails — exhaustion alone is not a reliable signal
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      new Iterator[U] {
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) closeOnce()
          h
        }
        override def next(): U = f(ctx, it.next())
      }
    }
}
