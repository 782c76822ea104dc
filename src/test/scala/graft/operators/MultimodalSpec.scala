package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("BmpCodec: encode -> ImageIO decode round-trips every pixel exactly") {
    val v: Int => Int = k => (k * 37 + 11) % 256 // arbitrary, covers all bins
    val bytes = Multimodal.BmpCodec.encodeBmp(5, 3, v)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO must decode the hand-rolled BMP")
    assert(img.getWidth == 5 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val k = (y * 5 + x) * 3
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == v(k), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == v(k + 1), s"G at ($x,$y)")
      assert((rgb & 0xff) == v(k + 2), s"B at ($x,$y)")
    }
  }

  test("decodeMeta: real image decode (dims formula) + stub audio/video checksums") {
    val rows = Multimodal.decodeAll(Multimodal.decodableMediaTable(spark, dir)).collect()
    assert(rows.length == 500)
    rows.foreach { m =>
      if (m.media_type == "image") {
        val (w, h) = Multimodal.BmpCodec.dims(m.doc_id)
        assert(m.width == w && m.height == h,
          s"decoded dims must match the derivation for doc ${m.doc_id}")
        val pad = (4 - (3 * w) % 4) % 4
        assert(m.byte_len == 54 + (3 * w + pad) * h, "real BMP container size")
        assert(m.duration_ms == 0L)
      } else {
        assert(m.width == 64 + (m.checksum % 1024).toInt)
        assert(m.height == 64 + ((m.checksum / 1024) % 1024).toInt)
        assert(m.duration_ms >= 1000L)
      }
    }
    // media_type assignment is doc_id % 3
    assert(rows.filter(_.doc_id % 3 == 0).forall(_.media_type == "image"))
  }

  test("features: 16-bin histogram is a distribution (sums to 1) for both codecs") {
    val feats = Multimodal.featuresAll(Multimodal.decodableMediaTable(spark, dir)).collect()
    assert(feats.length == 500)
    feats.take(30).foreach { f =>
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
