package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayKernels

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY columns + typed metadata struct, with decode / feature-
  * extract / resize / frame-sample stages.
  *
  * The decode step is a clearly-marked STUB (this environment has no
  * image/audio codecs): it derives deterministic fake dimensions from the
  * blob header bytes. Everything around it — the schema, the binary column
  * plumbing, partition-friendly batched execution, the real byte-level
  * feature kernels — is real and tested, so swapping the stub for a JNI/
  * codec call changes one function.
  *
  * Scale: blobs never shuffle (all stages are narrow maps over the scan);
  * aggregations run on extracted small features. This mirrors the
  * mapInPandas batch shape: per-partition batches of rows, vectorized body.
  */
object Multimodal {

  /** media(media_id, kind, blob, meta{width,height,sample_rate}) — the
    * canonical multimodal schema. Synthetic deterministic blobs (seeded by
    * id) stand in for real encoded media.
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).toDF("media_id")
      .select(
        col("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("media_id"), lit(3)) + 1).cast("int")).as("kind"),
        // deterministic pseudo-blob: concatenated hash hex of (id, chunk)
        unhex(concat((0 until 8).map(c =>
          lpad(hex(abs(xxhash64(col("media_id"), lit(c)))), 16, "0")): _*)).as("blob"),
        struct(
          (pmod(col("media_id"), lit(4)) * 160 + 320).cast("int").as("width"),
          (pmod(col("media_id"), lit(3)) * 120 + 240).cast("int").as("height"),
          lit(16000).as("sample_rate")).as("meta"))

  /** STUB decode: real systems call an image codec here (e.g. via JNI or a
    * Python mapInPandas worker). Deterministic fake: dimensions derived
    * from the first blob bytes. Signature and plumbing are production-real.
    */
  def decodeStub(blob: Column): Column =
    struct(
      (pmod(xxhash64(blob, lit(1)), lit(1024)) + 64).cast("int").as("dec_width"),
      (pmod(xxhash64(blob, lit(2)), lit(768)) + 64).cast("int").as("dec_height"),
      lit(3).as("channels"))

  /** Frame sampling: cut the blob into fixed-size frames and keep every
    * `stride`-th — the binary-plumbing form of video frame-sampling.
    * Pure `substring` arithmetic; stays narrow.
    */
  def frameSample(blob: Column, frameBytes: Int, stride: Int): Column =
    when(length(blob) === 0, array().cast("array<binary>")).otherwise(
      filter(
        transform(
          sequence(lit(0), ((length(blob) - lit(1)) / lit(frameBytes)).cast("int")),
          i => when(pmod(i, lit(stride)) === 0,
            substring(blob, (i * frameBytes + 1).cast("int"), lit(frameBytes)))),
        f => f.isNotNull))

  /** Feature extraction (REAL, not stubbed): 16-bin byte histogram over the
    * blob — the shape of any per-media feature vector computation.
    */
  def byteHistogram(blob: Column): Column = ArrayKernels.byte_histogram(blob, 16)

  /** Full pipeline over a media table: decode (stub) → per-kind feature
    * aggregation. Blobs stay in the scan stage; only 16-int features and
    * small metadata cross the (single) shuffle.
    */
  def mediaFeatures(media: DataFrame): DataFrame =
    media.select(
        col("media_id"), col("kind"),
        col("meta.width").as("width"),
        decodeStub(col("blob")).as("dec"),
        byteHistogram(col("blob")).as("hist"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        avg(col("width")).as("avg_width"),
        avg(col("dec.dec_width")).as("avg_dec_width"),
        sum(element_at(col("hist"), 1)).as("bin0_total"))
}
