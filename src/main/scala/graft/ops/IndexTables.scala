package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / probe-many index tables.
  *
  * The scale-safe replacement for `localCheckpoint()` on corpus-sized
  * intermediates (IVF cell assignments, LSH buckets, MinHash signatures):
  * localCheckpoint pins blocks in executor storage — it dies with executor
  * loss and is rebuilt per query — while a bucketed parquet table is written
  * once, survives failures, is reusable across queries AND JVMs, and
  * (when bucketed by the probe key) feeds joins/aggregations on that key
  * with no shuffle Exchange: the bucketing metadata already provides the
  * hash distribution.
  *
  * Reuse across processes: a completed on-disk index (marked by Spark's
  * `_SUCCESS`) is re-registered in a fresh catalog via CREATE TABLE over
  * its location instead of being rebuilt — schema comes from the parquet
  * footers, bucketing from the caller (the bucket count is baked into the
  * table name so a layout/spec mismatch cannot happen). Callers encode
  * every build parameter that changes the data (planes, seeds, hash counts,
  * source dir) into `name`; index tables are immutable once written.
  */
object IndexTables {

  private val baseDir = sys.env.getOrElse("GRAFT_INDEX_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft-index")

  /** Sanitize arbitrary cache-key parts (e.g. a data directory path) into a
    * valid SQL table identifier, stable across runs.
    */
  def ident(parts: String*): String =
    ("graft_idx_" + parts.mkString("_")).toLowerCase.replaceAll("[^a-z0-9_]", "_")

  private def registerOrBuild(spark: SparkSession, name: String,
      bucketSpec: String, build: => Unit): DataFrame = synchronized {
    if (!spark.catalog.tableExists(name)) {
      val path = s"$baseDir/$name"
      if (new java.io.File(s"$path/_SUCCESS").exists) {
        // completed index from an earlier JVM: register, don't rebuild.
        // Schema inference here reads one parquet footer, not the data.
        val schema = spark.read.parquet(path).schema.toDDL
        spark.sql(s"CREATE TABLE $name ($schema) USING PARQUET " +
          s"$bucketSpec LOCATION '$path'")
      } else build
    }
    spark.table(name)
  }

  /** Materialize `build` as a parquet table bucketed by `bucketCols` the
    * first time `name` is requested (per catalog, with cross-JVM on-disk
    * reuse); afterwards return the registered table scan. Joins/groupBys on
    * `bucketCols` over the result need no Exchange (asserted in
    * DedupSimilaritySpec).
    */
  def bucketed(spark: SparkSession, name: String, nBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String])(build: => DataFrame): DataFrame = {
    val n = s"${name}_b$nBuckets"
    val sorted = if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")}) " else ""
    registerOrBuild(spark, n,
      s"CLUSTERED BY (${bucketCols.mkString(", ")}) ${sorted}INTO $nBuckets BUCKETS", {
        val w = build.write.mode("overwrite").option("path", s"$baseDir/$n")
          .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
        (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
          .saveAsTable(n)
      })
  }

  /** Incremental maintenance for a growing corpus: append rows to an
    * existing bucketed index table. insertInto honors the catalog's bucket
    * spec — appended files carry bucket suffixes like the originals — so
    * probes keep their no-Exchange property and readers see the union
    * (asserted in DedupSimilaritySpec). Each append adds one file set per
    * bucket; rebuild (overwrite) periodically if appends accumulate.
    * `name` is the FULL table name as returned by `bucketed`'s catalog
    * entry (including the `_b<n>` suffix).
    */
  def append(spark: SparkSession, name: String, rows: DataFrame): Unit =
    synchronized { rows.write.mode("append").insertInto(name) }

  /** Drop an index: catalog entry AND on-disk files (so the next `bucketed`
    * call rebuilds instead of re-registering). The rebuild half of the
    * append-then-compact maintenance cycle. `name` is the full table name.
    */
  def drop(spark: SparkSession, name: String): Unit = synchronized {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val dir = new java.io.File(s"$baseDir/$name")
    if (dir.exists) rm(dir)
  }

  /** Un-bucketed variant for indexes whose probe key is derived downstream
    * (e.g. MinHash band hashes, computed after an explode of the stored
    * signature): materialization still buys build-once + failure-safety.
    */
  def plain(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    registerOrBuild(spark, name, "",
      build.write.mode("overwrite").option("path", s"$baseDir/$name")
        .saveAsTable(name))
}
