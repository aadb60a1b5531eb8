package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine — a broadcast of the (small) query set
  * against the (huge) corpus, all math in codegen'd higher-order functions
  * (`zip_with` + `aggregate`), accumulated in double. Scale path: random
  * hyperplane LSH buckets (deterministic seed) so candidate generation is a
  * bucket equi-join instead of a cartesian product.
  */
object Similarity {

  /** Dot product of two array columns, accumulated in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Cosine similarity of every corpus vector against one query vector
    * (`queryId`). Broadcast-join of the single-row query side — zero
    * shuffle of the corpus; the filter/projection stays on the scan.
    */
  def cosineToQuery(emb: DataFrame, queryId: Long): DataFrame = {
    val q = emb.where(col("vec_id") === queryId)
      .select(asDouble(col("embedding")).as("q_emb"))
    emb.where(col("vec_id") =!= queryId)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .join(broadcast(q))
      .select(col("vec_id"), round(cosine(col("emb"), col("q_emb")), 4).as("cos"))
  }

  /** Brute-force top-k nearest neighbours for one query vector.
    * TakeOrderedAndProject keeps the top-k selection distributed (per-
    * partition heaps, no global sort). Deterministic tie-break on vec_id.
    */
  def topKForQuery(emb: DataFrame, queryId: Long, k: Int): DataFrame =
    cosineToQuery(emb, queryId)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  /** For every vector: its nearest neighbour (excluding itself) among the
    * corpus — all-pairs via a single self-join; suitable as the exact
    * baseline at moderate corpus sizes and as the verifier for the LSH path.
    * Ties broken by lowest neighbour id via struct max ordering.
    */
  def nearestNeighbour(emb: DataFrame): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), asDouble(col("embedding")).as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), asDouble(col("embedding")).as("b_emb"))
    a.join(broadcast(b), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("a_emb"), col("b_emb")).as("cos"))
      // argmax per a_id: max of (cos, -b_id) struct → highest cos, lowest id
      .groupBy(col("a_id"))
      .agg(max(struct(col("cos"), (-col("b_id")).as("neg_id"))).as("best"))
      .select(col("a_id"), (-col("best.neg_id")).cast("long").as("nn_id"),
        round(col("best.cos"), 4).as("cos"))
  }

  /** Random-hyperplane LSH bucket id (deterministic seed): sign bits of
    * `numPlanes` fixed random projections. Vectors in the same bucket are
    * near-duplicate candidates; at 100 TB candidate generation becomes a
    * groupBy/join on a small integer key.
    */
  def lshBucket(emb: Column, dim: Int, numPlanes: Int = 8, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, i)) =>
      val proj = aggregate(
        zip_with(emb, array(plane.map(v => lit(v)): _*), (x, w) => x * w),
        lit(0.0d), (s, v) => s + v)
      acc.bitwiseOR(when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    }
  }

  /** LSH-bucketed near-neighbour candidate pairs with exact cosine —
    * the scale path: only intra-bucket pairs are scored.
    */
  def lshCandidatePairs(emb: DataFrame, dim: Int, numPlanes: Int = 8,
      minCos: Double = 0.0): DataFrame = {
    val bucketed = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"),
      lshBucket(asDouble(col("embedding")), dim, numPlanes).as("bucket"))
    val l = bucketed.select(col("bucket"), col("vec_id").as("a_id"), col("e").as("a_e"))
    val r = bucketed.select(col("bucket"), col("vec_id").as("b_id"), col("e").as("b_e"))
    l.join(r, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("a_e"), col("b_e")), 4).as("cos"))
      .where(col("cos") >= minCos)
  }
}
