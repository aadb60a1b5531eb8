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
  * reference reads (reference RichFunctions.scala:118-133) is
  * `SparkEnv`/`TaskContext` territory; expose the partition id, the closest
  * per-subtask analogue.
  */
object Rich {

  def mapWithLifecycle[T, U: Encoder](ds: Dataset[T])(
      open: Int => Unit, f: T => U, close: Int => Unit): Dataset[U] =
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      open(pid)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; close(pid) }
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
        override def next(): U = f(it.next())
      }
    }
}
