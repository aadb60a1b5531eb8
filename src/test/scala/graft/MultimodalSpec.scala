package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media table has the canonical multimodal schema") {
    val m = Multimodal.syntheticMedia(spark, 30)
    assert(m.schema("blob").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    // blobs are deterministic: same id → same bytes
    val b1 = m.where($"media_id" === 7).select("blob").as[Array[Byte]].head()
    val b2 = Multimodal.syntheticMedia(spark, 30)
      .where($"media_id" === 7).select("blob").as[Array[Byte]].head()
    assert(b1.toSeq == b2.toSeq && b1.length == 64)
  }

  test("decode stub is deterministic and bounded") {
    val m = Multimodal.syntheticMedia(spark, 10)
    val d = m.select(Multimodal.decodeStub($"blob").as("d"))
      .select("d.dec_width", "d.dec_height", "d.channels")
      .as[(Int, Int, Int)].collect()
    assert(d.forall { case (w, h, c) => w >= 64 && w < 1088 && h >= 64 && h < 832 && c == 3 })
    val again = m.select(Multimodal.decodeStub($"blob").as("d"))
      .select("d.dec_width", "d.dec_height", "d.channels")
      .as[(Int, Int, Int)].collect()
    assert(d.toSeq == again.toSeq)
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val m = Multimodal.syntheticMedia(spark, 1) // one 64-byte blob
    val frames = m.select(Multimodal.frameSample($"blob", 16, 2).as("f"))
      .select($"f").as[Seq[Array[Byte]]].head()
    assert(frames.length == 2)            // frames 0 and 2 of 4
    assert(frames.forall(_.length == 16))
  }

  test("byte histogram is a real feature: bins sum to blob length") {
    val m = Multimodal.syntheticMedia(spark, 5)
    val rows = m.select(length($"blob").as("len"),
        Multimodal.byteHistogram($"blob").as("h"))
      .as[(Int, Seq[Int])].collect()
    assert(rows.forall { case (len, h) => h.sum == len && h.length == 16 })
  }

  test("media pipeline aggregates features per kind, blobs never shuffle") {
    val got = Multimodal.mediaFeatures(Multimodal.syntheticMedia(spark, 30))
    val rows = got.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n_media")).sum == 30L)
  }

  test("decodeHeaders REALLY parses PPM/BMP/WAV headers (no codec library)") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    // P6 PPM, 640×480, maxval 255, followed by (truncated) RGB payload
    val ppm = "P6\n640 480\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(7.toByte)
    // BMP: "BM" + size + reserved + offset, then BITMAPINFOHEADER with
    // width 1920 at offset 18 and TOP-DOWN (negative) height -1080 at 22
    val bmp = "BM".getBytes("US-ASCII") ++ le(146, 4) ++ le(0, 4) ++ le(54, 4) ++
      le(40, 4) ++ le(1920, 4) ++ le(-1080L & 0xffffffffL, 4) ++ Array.fill(8)(0.toByte)
    // canonical WAV: RIFF size WAVE "fmt " 16 pcm=1 channels=2 rate=44100 …
    val wav = "RIFF".getBytes("US-ASCII") ++ le(36, 4) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(2, 2) ++
      le(44100, 4) ++ le(176400, 4) ++ le(4, 2) ++ le(16, 2)
    // a JPEG-ish blob no header parser recognizes → NULL (stub territory)
    val jpg = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ Array.fill(12)(1.toByte)
    val df = Seq(("ppm", ppm), ("bmp", bmp), ("wav", wav), ("jpg", jpg))
      .toDF("name", "blob")
      .select($"name", Multimodal.decodeHeaders($"blob").as("d"))
      .select($"name", $"d.dec_width", $"d.dec_height", $"d.channels",
        $"d.sample_rate", $"d.codec")
      .as[(String, Option[Int], Option[Int], Option[Int], Option[Int], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(df("ppm") == (("ppm", Some(640), Some(480), Some(3), None, Some("ppm"))))
    assert(df("bmp") == (("bmp", Some(1920), Some(1080), Some(3), None, Some("bmp"))))
    assert(df("wav") == (("wav", None, None, Some(2), Some(44100), Some("wav"))))
    assert(df("jpg") == (("jpg", None, None, None, None, None))) // honest NULL
  }

  test("imagePatchMeans: exact patch-grid RGB means from raw PPM pixels") {
    // 4×2 image, patch 2 → 2 patches; left patch solid red, right patch
    // a checker of green and blue → exact means (0,127.5,127.5)
    val px = Array(
      Array(255, 0, 0), Array(255, 0, 0), Array(0, 255, 0), Array(0, 0, 255),
      Array(255, 0, 0), Array(255, 0, 0), Array(0, 0, 255), Array(0, 255, 0))
    val ppm = "P6\n4 2\n255\n".getBytes("US-ASCII") ++
      px.flatten.map(_.toByte)
    val truncated = ppm.dropRight(1)
    val got = Seq(("ok", ppm), ("trunc", truncated))
      .toDF("name", "blob")
      .select($"name", Multimodal.imagePatchMeans($"blob", 2).as("p"))
      .as[(String, Option[Seq[(Int, Int, Double, Double, Double)]])]
      .collect().toMap
    assert(got("trunc").isEmpty) // missing byte → NULL, not wrong means
    val patches = got("ok").get.sortBy(p => (p._1, p._2))
    assert(patches == Seq(
      (0, 0, 255.0, 0.0, 0.0),
      (0, 1, 0.0, 127.5, 127.5)))
  }

  test("audioFrameEnergy computes exact per-frame RMS from PCM16 bytes") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    // canonical PCM16 mono WAV, 3 frames of 4 samples: constant +1000,
    // silence, then one max-negative sample (tests sign handling + the
    // partial final frame)
    val samples: Array[Short] =
      Array[Short](1000, 1000, 1000, 1000, 0, 0, 0, 0, Short.MinValue)
    val data = samples.flatMap(s => le(s.toLong & 0xffffL, 2))
    val wav = "RIFF".getBytes("US-ASCII") ++ le(36 + data.length, 4) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++
      le(16000, 4) ++ le(32000, 4) ++ le(2, 2) ++ le(16, 2) ++
      "data".getBytes("US-ASCII") ++ le(data.length, 4) ++ data
    val mp3 = Array(0xff, 0xfb).map(_.toByte) ++ Array.fill(40)(3.toByte)
    val got = Seq(("wav", wav), ("mp3", mp3)).toDF("name", "blob")
      .select($"name", Multimodal.audioFrameEnergy($"blob", 4).as("rms"))
      .as[(String, Option[Seq[Double]])].collect().toMap
    assert(got("mp3").isEmpty) // honest NULL for compressed codecs
    val rms = got("wav").get
    assert(rms.size == 3)
    assert(rms(0) == 1000.0) // constant amplitude → RMS is the amplitude
    assert(rms(1) == 0.0)
    assert(rms(2) == 32768.0) // |Short.MinValue|, single-sample frame
  }
}
