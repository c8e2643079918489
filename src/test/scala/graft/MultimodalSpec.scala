package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaCodec, MediaRow}

/** Multimodal plumbing: binary transport, partition-batched decode, frame
  * sampling — with the stub codec (no media libs in this environment). */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("decodeMeta round-trips the synthetic container headers") {
    val media = Multimodal.synthesize(spark, 60)
    val meta = Multimodal.decodeMeta(media).collect().sortBy(_.media_id)
    assert(meta.length == 60)
    assert(meta.forall(_.valid))
    meta.foreach { m =>
      val i = m.media_id
      assert(m.width == 16 + (i % 7).toInt * 16)
      assert(m.height == 16 + (i % 5).toInt * 16)
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      assert(m.kind == kind)
      assert(m.frames == (if (kind == "video") 1 + (i % 4).toInt else 1))
    }
  }

  test("invalid blobs are flagged, not fatal") {
    val bad = Seq(
      MediaRow(0L, "image", Array[Byte](1, 2, 3)),
      MediaRow(1L, "image", MediaCodec.encode("image", 8, 8, 1, Array(9)))
    ).toDS()
    val meta = Multimodal.decodeMeta(bad).collect().sortBy(_.media_id)
    assert(!meta(0).valid && meta(1).valid)
  }

  test("frame sampling: stride honored, deterministic features") {
    val media = Multimodal.synthesize(spark, 30)
    val feats = Multimodal.sampleFrameFeatures(media, stride = 2).collect()
    val byId = feats.groupBy(_.media_id)
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    byId.foreach { case (id, fs) =>
      val expected = (0 until meta(id).frames by 2).toSet
      assert(fs.map(_.frame).toSet == expected, s"media $id")
      fs.foreach(f => assert(f.feature.length == 8))
    }
    // determinism
    val again = Multimodal.sampleFrameFeatures(media, stride = 2).collect()
    assert(feats.map(f => (f.media_id, f.frame, f.feature.toSeq)).toSet ==
      again.map(f => (f.media_id, f.frame, f.feature.toSeq)).toSet)
  }

  test("statsByKind aggregates typed metadata") {
    val media = Multimodal.synthesize(spark, 90)
    val stats = Multimodal.statsByKind(Multimodal.decodeMeta(media))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("image" -> 30L, "audio" -> 30L, "video" -> 30L))
  }
}
