import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s: $r"); r
}
val d = "/root/testdata/sf0.1"
val ev = graft.Tables.events(spark, d)
val evX = (0 until 10).map(i => ev.withColumn("event_id", col("event_id") + lit(i * 10000000L))
  .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS"))).reduce(_ union _)
// store ts as raw nanos LONG so Tables.events' div-1000 path applies unchanged
evX.withColumn("ts", unix_micros(col("ts")) * 1000)
  .write.mode("overwrite").parquet("/tmp/stress/events.parquet")
val s = "/tmp/stress"
time("1M-window-sliding")(graft.SparkEntry.queries("q_window_sliding")(spark, s).count())
time("1M-window-session")(graft.SparkEntry.queries("q_window_session")(spark, s).count())
time("1M-interval-join")(graft.SparkEntry.queries("q_interval_join")(spark, s).count())
time("1M-keep-last3")(graft.SparkEntry.queries("q_keep_last3")(spark, s).count())
time("1M-running-sum")(graft.SparkEntry.queries("q_running_sum")(spark, s).count())
time("1M-window-join")(graft.SparkEntry.queries("q_window_join")(spark, s).count())
time("1M-asof-join")(graft.SparkEntry.queries("q_asof_join")(spark, s).count())
time("1M-evict-before")(graft.SparkEntry.queries("q_evict_before")(spark, s).count())
sys.exit(0)
