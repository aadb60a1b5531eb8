package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Dumps run CONCURRENTLY (round-14): the ~280 per-query writes are
  * independent job chains, so a fixed pool of dump slots keeps the
  * local[N] cores busy while any one query sits in planning or a
  * single-threaded stage — the same pattern as the per-column profile
  * jobs in [[graft.ops.Contracts.tableProfile]]. Each dump runs under
  * its own job group purely for attribution; queries share no mutable
  * state (no temp views; the two /tmp-writing queries use per-query
  * dirs; Tables.events' conf set is idempotent). Wall time on sf0.01
  * drops ~3x vs the sequential loop inside the driver's fixed window.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg (local iteration only — the driver passes two):
    // comma-separated query names to dump, instead of all of them
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val slots = sys.env.getOrElse("SPARK_GRAFT_VERIFY_SLOTS", "4").toInt
    // per-query deadline: one hung query must cost ONE missing parquet
    // dir, never the driver's whole fixed dump window (the round-13
    // lesson, applied to the dump side). 600 s is ~10× the slowest
    // observed per-query dump; a scheduled cancelJobGroup fires only if
    // the dump is still running at the deadline.
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "600").toLong
    val pool = Executors.newFixedThreadPool(slots)
    val watchdog = Executors.newSingleThreadScheduledExecutor()
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val sc = spark.sparkContext
    // per-query dump seconds, reported as a sorted tail so the next
    // round's dump hot spots are visible BEFORE they eat the driver's
    // fixed window (the check_oracle.py [N.Ns] discipline, dump side)
    val times = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val dumps = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        Future {
          // failures are PER-QUERY by contract: one broken query must
          // cost one missing parquet dir, never the whole dump
          val group = s"graft-verify-$name"
          val cancel = watchdog.schedule(new Runnable {
            def run(): Unit = {
              System.err.println(s"[verify] $name exceeded ${deadlineSec}s" +
                " — cancelling its jobs")
              sc.cancelJobGroup(group)
            }
          }, deadlineSec, java.util.concurrent.TimeUnit.SECONDS)
          val t0 = System.nanoTime()
          try {
            sc.setJobGroup(group, s"verify dump: $name",
              interruptOnCancel = true)
            // dump to a per-query temp dir and rename into place only on
            // success (round-14 advice): a deadline cancellation mid
            // write.mode("overwrite") would otherwise DELETE the previous
            // good dump for this query and leave a partial one — a timed-
            // out re-run must cost a stale artifact, never a broken one.
            // Move-ASIDE, not delete-then-move (round-15 advice): rename
            // the old dump to .old-$name first, move the new one in, then
            // delete the aside copy — a crash between the steps leaves a
            // good artifact under one of the two names instead of none.
            val tmp = s"$outDir/.tmp-$name"
            fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
            val target = Paths.get(s"$outDir/$name")
            val aside = Paths.get(s"$outDir/.old-$name")
            def rmTree(p: java.nio.file.Path): Unit =
              if (Files.exists(p)) {
                val walk = Files.walk(p)
                try walk.sorted(java.util.Comparator.reverseOrder())
                  .forEach(q => Files.delete(q))
                finally walk.close()
              }
            rmTree(aside) // leftover from a previous crashed run
            if (Files.exists(target)) Files.move(target, aside)
            Files.move(Paths.get(tmp), target)
            rmTree(aside)
            times.put(name, (System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          } finally {
            cancel.cancel(false)
            sc.clearJobGroup()
          }
        }
      }
    // oracle_sql.json lands BEFORE the dump wait: the compare needs it for
    // every query that DID dump, so a straggler-forced early exit (below)
    // must not cost the whole round's oracle file
    writeOracleJson(outDir, only)
    // BOUNDED outer wait (round-14 advice): cancelJobGroup only interrupts
    // active Spark jobs — a query stuck in driver-side work (planning, a
    // synchronized index-build monitor) never sees it, and an unbounded
    // Await would then hang the whole dump past the driver's window. One
    // hung query costs its own missing dir: wait out the healthy dumps,
    // then abandon stragglers and finish the artifact. The bound covers
    // the whole dump (queries queue over `slots`, so wall ≈ serial/slots:
    // 15 s/query/slot is ~2-3× the observed healthy average — r14 full
    // dump ran 284 queries / 4 slots in 109 s) plus one full per-query
    // deadline for a straggler in the last wave
    val outerBound = Duration.create(
      deadlineSec + 15L * math.max(1, dumps.size / slots) + 120L,
      java.util.concurrent.TimeUnit.SECONDS)
    try Await.ready(Future.sequence(dumps), outerBound)
    catch { case _: java.util.concurrent.TimeoutException =>
      System.err.println(s"[verify] outer deadline $outerBound hit — " +
        "abandoning stragglers so the dump artifact still lands")
      pool.shutdownNow()
    }
    watchdog.shutdownNow()
    pool.shutdown()
    locally {
      import scala.jdk.CollectionConverters._
      val ts = times.asScala.toSeq.sortBy(-_._2)
      val slow = ts.take(10).map { case (n, t) => f"$n=$t%.1fs" }
      System.err.println(f"[verify] dumped ${ts.size} queries, " +
        f"wall-sum ${ts.map(_._2).sum}%.1fs (concurrent); slowest: " +
        slow.mkString(", "))
    }
    spark.stop()
  }

  /** Dump `SparkEntry.oracleSql` (restricted to `only` when non-empty) as
    * outDir/oracle_sql.json. JSON string escape: backslash, quote, and ALL
    * control chars (<0x20) — a tab or CR in builder-authored SQL would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness.
    */
  private def writeOracleJson(outDir: String, only: Set[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
