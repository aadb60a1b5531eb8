package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayKernels

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY columns + typed metadata struct, with decode / feature-
  * extract / resize / frame-sample stages.
  *
  * Decode is two-tier: [[Multimodal.decodeHeaders]] REALLY parses the
  * codec-free container formats whose layout is pure bytes (PPM images,
  * BMP images, canonical WAV audio) with Catalyst expressions alone —
  * exact dimensions/channels/sample-rate, no library needed. Compressed
  * codecs (JPEG/PNG/MP3/H.264) need a decoder library this environment
  * lacks; for those [[Multimodal.decodeStub]] remains a clearly-marked
  * STUB fallback deriving deterministic fake dimensions, so swapping it
  * for a JNI/codec call changes one function.
  *
  * Scale: blobs never shuffle (all stages are narrow maps over the scan);
  * aggregations run on extracted small features. This mirrors the
  * mapInPandas batch shape: per-partition batches of rows, vectorized body.
  */
object Multimodal {

  /** The decoded-media schema shared by the real and stub decoders. */
  private val DEC_T =
    "struct<dec_width:int,dec_height:int,channels:int,sample_rate:int,codec:string>"

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

  /** Little-endian unsigned integer read from `nBytes` at 1-based byte
    * offset `pos` — byte access via substring + hex, so the whole read is
    * codegen'd string/number expressions (no UDF).
    */
  private def leUInt(blob: Column, pos: Int, nBytes: Int): Column =
    conv(concat((0 until nBytes).reverse.map(i =>
      lpad(hex(substring(blob, pos + i, 1)), 2, "0")): _*), 16, 10).cast("long")

  /** REAL decode for codec-free container formats — exact header parsing
    * as pure Catalyst expressions:
    *   - PPM (P6): ASCII header `P6 <width> <height> <maxval>`;
    *   - BMP: little-endian int32 width/height at byte offsets 18/22
    *     (signed height: top-down bitmaps store it negative);
    *   - WAV (canonical RIFF layout): channels at offset 22 (uint16),
    *     sample rate at offset 24 (uint32).
    * Returns NULL for unrecognized blobs (i.e. compressed codecs) — the
    * honest signal; callers choose the fallback (see [[mediaFeatures]]).
    */
  def decodeHeaders(blob: Column): Column = {
    val ppmHead = substring(blob, 1, 32).cast("string")
    val ppmRe = "^P6\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)"
    val isPpm = regexp_extract(ppmHead, ppmRe, 1) =!= ""
    // two magic bytes alone would false-positive on arbitrary binaries (or
    // text cast to binary) starting with "BM" — require a known DIB header
    // size at offset 14 as a second witness, as the WAV branch does with
    // "WAVEfmt". All BITMAPINFO* variants (40/52/56 core, 108 V4, 124 V5)
    // keep width/height at offsets 18/22
    val isBmp = hex(substring(blob, 1, 2)) === "424D" &&
      leUInt(blob, 15, 4).isin(40L, 52L, 56L, 108L, 124L)
    val isWav = substring(blob, 1, 4).cast("string") === "RIFF" &&
      substring(blob, 9, 7).cast("string") === "WAVEfmt"
    val bmpHRaw = leUInt(blob, 23, 4)
    val bmpH = abs(when(bmpHRaw > Int.MaxValue, bmpHRaw - 4294967296L)
      .otherwise(bmpHRaw))
    val nullInt = lit(null).cast("int")
    when(isPpm, struct(
        regexp_extract(ppmHead, ppmRe, 1).cast("int").as("dec_width"),
        regexp_extract(ppmHead, ppmRe, 2).cast("int").as("dec_height"),
        lit(3).as("channels"), nullInt.as("sample_rate"), lit("ppm").as("codec")))
      .when(isBmp, struct(
        leUInt(blob, 19, 4).cast("int").as("dec_width"),
        bmpH.cast("int").as("dec_height"),
        lit(3).as("channels"), nullInt.as("sample_rate"), lit("bmp").as("codec")))
      .when(isWav, struct(
        nullInt.as("dec_width"), nullInt.as("dec_height"),
        leUInt(blob, 23, 2).cast("int").as("channels"),
        leUInt(blob, 25, 4).cast("int").as("sample_rate"), lit("wav").as("codec")))
      .otherwise(lit(null).cast(DEC_T))
  }

  /** STUB decode: real systems call an image codec here (e.g. via JNI or a
    * Python mapInPandas worker). Deterministic fake: dimensions derived
    * from the first blob bytes. Signature and plumbing are production-real.
    */
  def decodeStub(blob: Column): Column =
    struct(
      (pmod(xxhash64(blob, lit(1)), lit(1024)) + 64).cast("int").as("dec_width"),
      (pmod(xxhash64(blob, lit(2)), lit(768)) + 64).cast("int").as("dec_height"),
      lit(3).as("channels"),
      lit(null).cast("int").as("sample_rate"),
      lit("stub").as("codec"))

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

  /** Full pipeline over a media table: decode (real header parse when the
    * format is recognized, stub fallback for compressed codecs) → per-kind
    * feature aggregation. Blobs stay in the scan stage; only 16-int
    * features and small metadata cross the (single) shuffle.
    */
  def mediaFeatures(media: DataFrame): DataFrame =
    media.select(
        col("media_id"), col("kind"),
        col("meta.width").as("width"),
        coalesce(decodeHeaders(col("blob")), decodeStub(col("blob"))).as("dec"),
        byteHistogram(col("blob")).as("hist"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        avg(col("width")).as("avg_width"),
        avg(col("dec.dec_width")).as("avg_dec_width"),
        sum(element_at(col("hist"), 1)).as("bin0_total"))
}
