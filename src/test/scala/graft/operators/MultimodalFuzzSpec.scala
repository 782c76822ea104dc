package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._

import java.nio.{ByteBuffer, ByteOrder}

/** Hostile-container fuzz for the binary decode paths: a truncated RIFF
  * chunk list, a BMP header lying about its raster, a WAV fmt chunk
  * declaring an unsupported layout — every one must FLAG (decode_ok = 0
  * / the frame_no = -1 sentinel), never throw and kill the query, and
  * never reach a decoder allocation sized by a lie. Valid rows in the
  * same batch must stay bit-exact. The DuckDB oracle cannot exercise
  * this (fixture containers are well-formed by construction), so the
  * corrupt-input contract lives here.
  */
class MultimodalFuzzSpec extends SparkSpec {

  private def text(n: Int): Array[Byte] =
    (0 until n).map(i => (32 + i % 90).toChar).mkString.getBytes("ISO-8859-1")

  private val bmpValid = {
    val (w, h) = BmpCodec.dims(12L)
    BmpCodec.encodeBmp(w, h, BmpCodec.pixelFn(text(200)))
  }
  private val wavValid = WavCodec.encodeWav(
    Array.tabulate(180)(k => WavCodec.sampleFn(text(180))(k).toShort))
  private val aviValid = AviCodec.encodeAvi(14L, text(250))

  private def patched(a: Array[Byte])(f: ByteBuffer => Unit): Array[Byte] = {
    val b = a.clone()
    f(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
    b
  }

  private def metaOf(rows: Seq[MediaRow]): Map[Long, MediaMetaV] = {
    import spark.implicits._
    decodeAll(spark.createDataset(rows)).collect().map(m => m.doc_id -> m).toMap
  }

  test("BMP: truncated/lying/hostile headers flag; the valid row in the batch stays exact") {
    val direct = BmpCodec.decodeMeta(MediaRow(1L, "image", bmpValid))
    val got = metaOf(Seq(
      MediaRow(1L, "image", bmpValid),
      MediaRow(2L, "image", bmpValid.take(20)),          // truncated header
      MediaRow(3L, "image", bmpValid.dropRight(7)),      // truncated raster
      MediaRow(4L, "image", patched(bmpValid)(_.putInt(18, 1000000))), // lying width
      MediaRow(5L, "image", patched(bmpValid)(_.putInt(22, -5))),      // negative height
      MediaRow(6L, "image", { val b = bmpValid.clone(); b(0) = 'X'.toByte; b }),
      MediaRow(7L, "image", Array.empty[Byte]),
      MediaRow(8L, "image", text(64)),                   // arbitrary non-BMP bytes
      // compression bomb: a KB-sized body claiming compression=1 (RLE8)
      // with MaxDim x MaxDim dims skips the raster-fits-buffer bound —
      // the pixels-per-byte gate must flag it BEFORE ImageIO would size
      // a ~268 MB raster from the lie (OOM is fatal and escapes the
      // total-decode wrapper)
      MediaRow(9L, "image", patched(bmpValid) { b =>
        b.putInt(18, 8192); b.putInt(22, 8192); b.putInt(30, 1)
      }),
      // BI_BITFIELDS bomb: compression=3 is STORED UNCOMPRESSED (masks
      // only), so the strict raster-fits-buffer bound applies — a body
      // big enough to slip the 128 px/byte ratio gate must still flag
      // because the declared 8192x8192 raster is not in the buffer
      MediaRow(10L, "image", patched(bmpValid) { b =>
        b.putInt(18, 8192); b.putInt(22, 8192); b.putInt(30, 3)
      }),
      // BIG-body compressed bomb: a ~600 KB RLE-claimed body slips the
      // 128 px/byte ratio gate (67.1 M declared px ≤ 76.8 M allowed) —
      // the ABSOLUTE MaxCompressedPixels budget must flag it before
      // ImageIO sizes a ~268 MB raster from the claim
      MediaRow(11L, "image", patched(
          bmpValid ++ Array.fill(600000)('A'.toByte)) { b =>
        b.putInt(18, 8192); b.putInt(22, 8192); b.putInt(30, 1)
      })))
    assert(got.size == 11, "every row must come back — flagged, not thrown")
    assert(got(1L).decode_ok == 1 && got(1L).checksum == direct.checksum
      && got(1L).width == direct.width && got(1L).height == direct.height,
      "a bad neighbor must not perturb the valid row")
    (2L to 11L).foreach { id =>
      assert(got(id).decode_ok == 0 && got(id).checksum == -1L
        && got(id).width == 0 && got(id).height == 0,
        s"doc $id must flag, got ${got(id)}")
    }
  }

  test("compressed-pixel gate: ratio AND absolute budget, one definition for BMP and AVI frames") {
    import graft.operators.Multimodal.{checkCompressedPixels, MaxCompressedPixels}
    // small body, huge claim: the ratio arm rejects
    assertThrows[IllegalArgumentException](
      checkCompressedPixels(8192, 8192, 1024, "t", 1L))
    // big body (slips the ratio arm), huge claim: the ABSOLUTE arm rejects
    assertThrows[IllegalArgumentException](
      checkCompressedPixels(8192, 8192, 600000, "t", 1L))
    // big body, claim within both arms: admitted
    checkCompressedPixels(4096, 4096, 600000, "t", 1L)
    assert(4096L * 4096 <= MaxCompressedPixels)
  }

  test("WAV: truncation and lying fmt chunks flag, never throw") {
    val direct = WavCodec.decodeMeta(MediaRow(1L, "audio", wavValid))
    val got = metaOf(Seq(
      MediaRow(1L, "audio", wavValid),
      MediaRow(2L, "audio", wavValid.take(10)),                         // truncated preamble
      MediaRow(3L, "audio", patched(wavValid)(_.putShort(22, 2))),      // stereo (unsupported)
      MediaRow(4L, "audio", patched(wavValid)(_.putShort(34, 8))),      // 8-bit (unsupported)
      MediaRow(5L, "audio", patched(wavValid)(_.putInt(24, 0))),        // rate 0 (division lie)
      MediaRow(6L, "audio", text(48))))                                 // arbitrary bytes
    assert(got.size == 6)
    assert(got(1L).decode_ok == 1 && got(1L).checksum == direct.checksum)
    (2L to 6L).foreach { id =>
      assert(got(id).decode_ok == 0, s"doc $id must flag, got ${got(id)}")
    }
  }

  test("AVI: truncated chunk lists, size lies, missing/lying strf and LIST bombs all flag") {
    val strfIdx = aviValid.indexOfSlice("strf".getBytes("US-ASCII"))
    assert(strfIdx > 0, "fixture AVI must carry an strf chunk")
    // a chain of LISTs nested past any real container's depth: the walk
    // must hit its depth cap, not the JVM's stack
    val nested = (1 to 30).foldLeft(Array.empty[Byte]) { (inner, _) =>
      val b = ByteBuffer.allocate(12 + inner.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
        .put("nest".getBytes("US-ASCII")).put(inner)
      b.array()
    }
    val bomb = {
      val b = ByteBuffer.allocate(12 + nested.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + nested.length)
        .put("AVI ".getBytes("US-ASCII")).put(nested)
      b.array()
    }
    val direct = AviCodec.decodeMeta(MediaRow(1L, "video", aviValid))
    val got = metaOf(Seq(
      MediaRow(1L, "video", aviValid),
      MediaRow(2L, "video", aviValid.take(100)),                        // truncated mid-chunk
      MediaRow(3L, "video", patched(aviValid)(_.putInt(16, Int.MaxValue))), // size lie
      MediaRow(4L, "video", patched(aviValid)(_.putInt(16, -2))),       // negative size
      MediaRow(5L, "video", patched(aviValid)(
        _.put(strfIdx, 'x'.toByte))),                                   // no strf header
      MediaRow(6L, "video", patched(aviValid)(
        _.putInt(strfIdx + 8 + 4, 100000))),                            // lying stream width
      MediaRow(7L, "video", bomb),
      MediaRow(8L, "video", Array.empty[Byte]),
      // compressed-stream bomb: biCompression=1 with MaxDim x MaxDim dims
      // skips the uncompressed raster bound; the per-frame pixels-per-byte
      // gate must flag before any frame BMP assembly sizes on the lie
      MediaRow(9L, "video", patched(aviValid) { b =>
        b.putInt(strfIdx + 8 + 4, 8192)   // biWidth
        b.putInt(strfIdx + 8 + 8, 8192)   // biHeight
        b.putInt(strfIdx + 8 + 16, 1)     // biCompression
      }),
      // BI_BITFIELDS stream bomb: stored-uncompressed, so the strict
      // frame-holds-raster bound applies regardless of the ratio gate
      MediaRow(10L, "video", patched(aviValid) { b =>
        b.putInt(strfIdx + 8 + 4, 8192)
        b.putInt(strfIdx + 8 + 8, 8192)
        b.putInt(strfIdx + 8 + 16, 3)
      })))
    assert(got.size == 10)
    assert(got(1L).decode_ok == 1 && got(1L).checksum == direct.checksum)
    (2L to 10L).foreach { id =>
      assert(got(id).decode_ok == 0, s"doc $id must flag, got ${got(id)}")
    }
  }

  test("video frame explode: corrupt containers emit the frame_no = -1 sentinel row") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "video", aviValid),
      MediaRow(2L, "video", aviValid.take(60)),
      MediaRow(3L, "video", text(30)))
    val got = videoFramesAll(spark.createDataset(rows)).collect()
    val good = got.filter(_.doc_id == 1L)
    assert(good.length == AviCodec.frameCount(14L)
      && good.forall(f => f.frame_no >= 0 && f.frame_checksum >= 0))
    Seq(2L, 3L).foreach { id =>
      val bad = got.filter(_.doc_id == id)
      assert(bad.toSeq == Seq(FrameRow(id, -1, 0, 0, -1L)),
        s"doc $id must surface exactly its sentinel row, got ${bad.toSeq}")
    }
  }

  test("deterministic mutation sweep: 300 corrupt containers cannot kill a decode job") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def mutate(a: Array[Byte]): Array[Byte] = rnd.nextInt(3) match {
      case 0 => a.take(rnd.nextInt(a.length + 1)) // truncate anywhere
      case 1 => // flip one bit
        val b = a.clone()
        val i = rnd.nextInt(a.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
        b
      case _ => // stomp a 32-bit field (sizes, dims, offsets)
        patched(a)(_.putInt(rnd.nextInt(math.max(a.length - 4, 1)), rnd.nextInt()))
    }
    val mutants =
      (0 until 100).map(i => MediaRow(1000L + i, "image", mutate(bmpValid))) ++
      (0 until 100).map(i => MediaRow(2000L + i, "audio", mutate(wavValid))) ++
      (0 until 100).map(i => MediaRow(3000L + i, "video", mutate(aviValid)))
    val rows = Seq(MediaRow(1L, "image", bmpValid), MediaRow(2L, "audio", wavValid),
      MediaRow(3L, "video", aviValid)) ++ mutants
    val ds = spark.createDataset(rows)

    val metas = decodeAll(ds).collect()
    assert(metas.length == rows.size, "one verdict row per input, no loss, no throw")
    Seq(1L, 2L, 3L).foreach(id =>
      assert(metas.find(_.doc_id == id).get.decode_ok == 1,
        s"valid doc $id must survive the hostile batch"))

    val feats = featuresAll(ds).collect()
    assert(feats.length == rows.size)
    feats.foreach { f =>
      assert(f.features.length == 16)
      if (f.decode_ok == 0)
        assert(f.features.forall(_ == 0.0), s"flagged doc ${f.doc_id} must zero its vector")
    }

    val vids = videoFramesAll(ds.filter(_.media_type == "video")).collect()
    assert(vids.map(_.doc_id).toSet == rows.filter(_.media_type == "video").map(_.doc_id).toSet,
      "every video doc stays visible in the frame explode — decoded or sentinel")
  }
}
