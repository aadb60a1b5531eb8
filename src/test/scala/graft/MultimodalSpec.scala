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
}
