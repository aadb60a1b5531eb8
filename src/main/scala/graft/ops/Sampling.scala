package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * At 100 TB, `df.sample()` is the wrong tool: its RNG draw depends on
  * partition layout and task retries, so a re-run (or a recovered executor)
  * yields a DIFFERENT sample. Hashing a stable id into [0,1) instead makes
  * the sample a pure function of the data — reproducible across runs,
  * engines, cluster sizes, and retries, trivially parallel (a pushed-down
  * filter on the scan, no shuffle), and consistent across tables (the same
  * id set is selected everywhere, so joins between sampled tables stay
  * aligned). This is the standard "hash mod" sampling used in large corpus
  * curation.
  */
object Sampling {

  /** Uniform hash of `id` into 32 bits as a fixed-width (9-digit,
    * '0'-padded) lowercase-hex string. Fixed width means lexicographic
    * comparison ≡ numeric comparison — including against the rate=1.0
    * threshold "100000000" — which keeps the predicate expressible
    * identically in any engine with md5 (the DuckDB oracles mirror it
    * verbatim). 32 bits quantize rates to 1/2^32 ≈ 2.3e-10, so even a
    * 0.0001 % sample of a 100 TB corpus is reachable (16 bits capped out
    * at ~1.5e-5). `salt` decorrelates independent samples from the same
    * ids.
    */
  private def hashKey(id: Column, salt: String): Column =
    concat(lit("0"), substring(md5(concat(lit(salt), id.cast("string"))), 1, 8))

  /** 9-digit hex threshold selecting `rate` of the 32-bit hash space.
    * `private[graft]` so SparkEntry's DuckDB oracle strings interpolate the
    * same constants instead of hand-duplicating them.
    */
  private[graft] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.round(rate * 4294967296L.toDouble).min(4294967296L)}%09x"
  }

  /** Deterministic `rate`-fraction sample of rows by hashed id. The filter
    * pushes to the scan; no RNG state, no shuffle.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.where(hashKey(col(idCol), salt) < lit(hexThreshold(rate)))

  /** Stratified deterministic sample: per-stratum rates (e.g. re-balancing
    * languages or sources in a training mix). Unlisted strata default to
    * `defaultRate`. One pass, one pushed-down predicate — the scalable form
    * of `DataFrameStatFunctions.sampleBy`, made retry-stable.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.where(hashKey(col(idCol), salt) < threshold)
  }

  /** Deterministic train/validation/test split: assigns each row a split
    * label by hash position — disjoint, exhaustive, and stable under
    * re-runs (no row ever migrates between splits when data is appended,
    * unlike randomSplit).
    */
  def hashSplit(df: DataFrame, idCol: String, trainRate: Double,
      validRate: Double, salt: String = ""): DataFrame = {
    val k = hashKey(col(idCol), salt)
    df.withColumn("split",
      when(k < lit(hexThreshold(trainRate)), "train")
        .when(k < lit(hexThreshold(trainRate + validRate)), "valid")
        .otherwise("test"))
  }
}
