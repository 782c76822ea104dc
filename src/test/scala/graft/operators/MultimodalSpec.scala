package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decodeMeta: checksum equals the byte-wise polynomial hash; meta derived from it") {
    val rows = Multimodal.decodeAll(Multimodal.mediaTable(spark, dir)).collect()
    assert(rows.length == 500)
    rows.take(20).foreach { m =>
      assert(m.width == 64 + (m.checksum % 1024).toInt)
      assert(m.height == 64 + ((m.checksum / 1024) % 1024).toInt)
      if (m.media_type == "image") assert(m.duration_ms == 0L)
      else assert(m.duration_ms >= 1000L)
    }
    // media_type assignment is doc_id % 3
    assert(rows.filter(_.doc_id % 3 == 0).forall(_.media_type == "image"))
  }

  test("features: 16-bin byte histogram is a distribution (sums to 1)") {
    val feats = Multimodal.featuresAll(Multimodal.mediaTable(spark, dir)).collect()
    assert(feats.length == 500)
    feats.take(20).foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9)
      assert(f.features.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("sampleFrames: stride offsets, fixed frame length, per-doc ordering") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, dir))
      .filter($"doc_id" === 0L).collect().sortBy(_.frame_no)
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.offset == f.frame_no * 64)
      assert(f.frame_bytes.length == 16)
    }
  }
}
