package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample plumbing.
  *
  * IMAGE rows decode for REAL: `imageTable` builds genuine 24-bit BMP
  * files (hand-rolled header + bottom-up BGR pixel rows, pixels derived
  * deterministically from the document text) and `BmpCodec` decodes them
  * with the in-JDK `javax.imageio.ImageIO` — no stub, no external jars.
  * The oracle recomputes the expected pixels from the same derivation, so
  * a bug anywhere in the encode→decode round trip (header layout, row
  * order, padding, channel order) breaks the hash compare.
  *
  * AUDIO/VIDEO decode remains a clearly-marked stub (`FakeCodec` — the
  * container has no media codecs): deterministic pseudo-metadata from the
  * bytes. Everything around both codecs — the binary schema, the batched
  * `mapPartitions` shape (the Scala analog of a vectorized/Pandas UDF:
  * one iterator per partition, amortized setup, no per-row driver
  * involvement), the explode of sampled frames, and the partitioning — is
  * real and is what matters at 100 TB: media bytes stay in executors,
  * metadata flows as narrow typed columns, and the expensive decode is a
  * map-side single pass.
  *
  * The media table is derived deterministically from `documents` (the
  * fixtures ship no binary table): content = UTF-8 bytes of `text` (raw
  * byte-walk ops: resize/frames/phash) or a real BMP built from them
  * (decode ops), media_type = doc_id % 3 -> image|audio|video.
  */
object Multimodal {

  /** Typed row for the media table. */
  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded metadata produced by the (stub) codec. */
  case class MediaMeta(
      doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, duration_ms: Long, checksum: Long)

  /** Per-media fixed-width feature vector (16-bin byte histogram). */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** Sampled frame: offset + a slice of bytes. */
  case class Frame(doc_id: Long, frame_no: Int, offset: Int, frame_bytes: Array[Byte])

  /** REAL image codec: hand-rolled 24-bit BMP encoder + `javax.imageio`
    * decoder (both in-JDK). Pixel channel values are a deterministic
    * function of the source text bytes — value at flat index
    * k = (y*w + x)*3 + c (row-major top-down, channels R,G,B) is
    * byte[k mod len] — which the DuckDB oracle replays independently, so
    * the decoded width/height/pixel checksum verify the full container
    * round trip, not just the arithmetic. */
  object BmpCodec {
    private val MOD = 1000000007L

    /** Deterministic image dimensions from doc_id (4..16 x 4..14). */
    def dims(docId: Long): (Int, Int) =
      ((4 + docId % 13).toInt, (4 + (docId / 13) % 11).toInt)

    /** Channel value source: source byte at k mod len (0 when empty). */
    def pixelFn(text: Array[Byte]): Int => Int =
      k => if (text.isEmpty) 0 else text(k % text.length) & 0xff

    /** 24bpp BMP: 54-byte header, bottom-up rows, BGR, 4-byte row pad. */
    def encodeBmp(w: Int, h: Int, v: Int => Int): Array[Byte] = {
      val rowBytes = w * 3
      val pad = (4 - rowBytes % 4) % 4
      val imageSize = (rowBytes + pad) * h
      val b = java.nio.ByteBuffer.allocate(54 + imageSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
        .putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(imageSize).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var y = h - 1 // bottom row first
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val k = (y * w + x) * 3
          b.put(v(k + 2).toByte).put(v(k + 1).toByte).put(v(k).toByte)
          x += 1
        }
        var p = 0
        while (p < pad) { b.put(0.toByte); p += 1 }
        y -= 1
      }
      b.array()
    }

    private def decode(r: MediaRow): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      require(img != null, s"ImageIO could not decode media for doc ${r.doc_id}")
      img
    }

    /** Real decode: width/height from the decoder, checksum = polynomial
      * fold over decoded R,G,B channel values in row-major scan order. */
    def decodeMeta(r: MediaRow): MediaMeta = {
      val img = decode(r)
      var acc = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          acc = (acc * 31 + ((rgb >> 16) & 0xff)) % MOD
          acc = (acc * 31 + ((rgb >> 8) & 0xff)) % MOD
          acc = (acc * 31 + (rgb & 0xff)) % MOD
          x += 1
        }
        y += 1
      }
      MediaMeta(r.doc_id, r.media_type, r.content.length,
        img.getWidth, img.getHeight, duration_ms = 0L, checksum = acc)
    }

    /** 16-bin histogram over decoded channel values (v / 16), normalized
      * by the channel count w*h*3. */
    def decodeFeatures(r: MediaRow): MediaFeatures = {
      val img = decode(r)
      val hist = new Array[Double](16)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          hist(((rgb >> 16) & 0xff) / 16) += 1.0
          hist(((rgb >> 8) & 0xff) / 16) += 1.0
          hist((rgb & 0xff) / 16) += 1.0
          x += 1
        }
        y += 1
      }
      val n = img.getWidth * img.getHeight * 3
      MediaFeatures(r.doc_id, hist.map(_ / n))
    }
  }

  /** STUB codec — deterministic fakes in place of real AUDIO/VIDEO
    * decoders (the ??? boundary; image rows use the real [[BmpCodec]]).
    * Swap `decodeMeta`/`decodeFeatures` for javacv/ffmpeg etc. in a real
    * deployment; signatures and batch shape stay identical. */
  object FakeCodec {
    def decodeMeta(r: MediaRow): MediaMeta = {
      var h = 0L
      var i = 0
      while (i < r.content.length) {
        h = (h * 31 + (r.content(i) & 0xff)) % 1000000007L
        i += 1
      }
      MediaMeta(r.doc_id, r.media_type, r.content.length,
        width = 64 + (h % 1024).toInt, height = 64 + ((h / 1024) % 1024).toInt,
        duration_ms = if (r.media_type == "image") 0L else 1000L + h % 60000L,
        checksum = h)
    }

    def decodeFeatures(r: MediaRow): MediaFeatures = {
      val hist = new Array[Double](16)
      var i = 0
      while (i < r.content.length) {
        hist((r.content(i) & 0xff) / 16) += 1.0
        i += 1
      }
      val n = math.max(r.content.length, 1)
      MediaFeatures(r.doc_id, hist.map(_ / n))
    }
  }

  /** Build the media table from `documents` (deterministic derivation). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      // coalesce: a NULL-text document must become EMPTY media bytes, not a
      // null array that NPEs inside the codec kernels executor-side (the
      // oracles wrap documents with the same coalesce)
      .selectExpr("doc_id",
        "element_at(array('image','audio','video'), CAST(doc_id % 3 AS INT) + 1) AS media_type",
        "encode(coalesce(text, ''), 'UTF-8') AS content")
      .as[MediaRow]
  }

  /** Image rows as REAL BMP files (executor-side encode — the bytes never
    * visit the driver), decodable by [[BmpCodec]]/ImageIO. */
  def imageTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter("doc_id % 3 = 0")
      .selectExpr("doc_id", "encode(coalesce(text, ''), 'UTF-8') AS raw")
      .as[(Long, Array[Byte])]
      .map { case (id, raw) =>
        val (w, h) = BmpCodec.dims(id)
        MediaRow(id, "image", BmpCodec.encodeBmp(w, h, BmpCodec.pixelFn(raw)))
      }
  }

  /** The decode-facing media table: real BMPs for image rows, raw bytes
    * for audio/video (whose codecs are the stub). The byte-walk operators
    * (resize/frames/phash) keep reading [[mediaTable]]'s raw bytes. */
  def decodableMediaTable(s: SparkSession, dir: String): Dataset[MediaRow] =
    imageTable(s, dir).unionByName(
      mediaTable(s, dir).filter(col("media_type") =!= "image"))

  /** Batched decode: one codec instance per partition (the expensive-setup
    * pattern of a vectorized UDF), metadata out as typed columns. Image
    * rows go through the REAL ImageIO decoder; audio/video use the stub. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup for the real codec happens here (ImageIO
      // plugin lookup is JVM-global and thread-safe; nothing to init)
      rows.map(r =>
        if (r.media_type == "image") BmpCodec.decodeMeta(r)
        else FakeCodec.decodeMeta(r))
    }
  }

  /** Batched feature extraction (fixed-width vectors for the ANN surface):
    * real decoded-pixel histograms for images, stub byte histograms for
    * audio/video. */
  def featuresAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      if (r.media_type == "image") BmpCodec.decodeFeatures(r)
      else FakeCodec.decodeFeatures(r)))
  }

  /** Resized media: deterministic stub "thumbnail" (every stride-th byte,
    * ≤ `target` bytes) standing in for a real image resize. */
  case class Resized(doc_id: Long, in_len: Int, out_len: Int, resized_checksum: Long)

  /** Stub resize: keep every ceil(len/target)-th byte (a deterministic
    * downsample standing in for real pixel resampling; swap the kernel for
    * an image library in deployment — the executor-side single-pass shape
    * is the real design). Returns length + rolling checksum of the
    * downsampled bytes so the oracle can replay it. */
  def resizeAll(media: Dataset[MediaRow], target: Int = 64): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = r.content.length
      val stride = math.max(1, (n + target - 1) / target)
      var h = 0L
      var outLen = 0
      var i = 0
      while (i < n) {
        h = (h * 31 + (r.content(i) & 0xff)) % 1000000007L
        outLen += 1
        i += stride
      }
      Resized(r.doc_id, n, outLen, h)
    })
  }

  /** Frame sampling: every `stride` bytes take a `frameLen`-byte slice —
    * the explode shape of video frame extraction (rows stay executor-side). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 64, frameLen: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Iterator.range(0, math.max(r.content.length - frameLen + 1, 0), stride).zipWithIndex.map {
        case (off, no) => Frame(r.doc_id, no, off, r.content.slice(off, off + frameLen))
      }
    }
  }

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- metadata decode over binary columns. IMAGE rows: real BMP decode
    // via javax.imageio — the oracle recomputes width/height (dims formula),
    // byte_len (BMP container size incl. row padding) and the checksum over
    // the EXPECTED pixels (byte k mod len derivation), so the container
    // round trip is verified end to end. Audio/video: stub codec, oracle
    // replays the byte arithmetic over the same UTF-8 bytes. ---------------
    "multimodal_meta" -> QueryDef(
      (s, dir) => {
        decodeAll(decodableMediaTable(s, dir)).toDF()
          .select(col("doc_id"), col("media_type"), col("byte_len"),
            col("width"), col("height"), col("duration_ms"), col("checksum"))
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      """WITH imgsrc AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    4 + (doc_id % 13) AS w, 4 + ((doc_id // 13) % 11) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |imeta AS (
        |  SELECT doc_id, 'image' AS media_type,
        |    (54 + (3 * w + ((4 - (3 * w) % 4) % 4)) * h)::INT AS byte_len,
        |    w::INT AS width, h::INT AS height, 0::BIGINT AS duration_ms,
        |    -- expected pixels: channel value at flat index k is the source
        |    -- byte at k mod len (ASCII corpus: bytes == code points)
        |    list_reduce(list_prepend(0::BIGINT, list_transform(range(0, w * h * 3),
        |      k -> (CASE WHEN length(text) = 0 THEN 0
        |                 ELSE ascii(substr(text, ((k % length(text)) + 1)::INT, 1)) END)::BIGINT)),
        |      (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |  FROM imgsrc),
        |fake AS (
        |  SELECT doc_id,
        |    ['image','audio','video'][(doc_id % 3)::INT + 1] AS media_type,
        |    octet_length(encode(text))::INT AS byte_len,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))::BIGINT)),
        |      (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents
        |        WHERE doc_id % 3 != 0))
        |SELECT doc_id, media_type, byte_len, width, height, duration_ms, checksum
        |FROM (
        |  SELECT * FROM imeta
        |  UNION ALL
        |  SELECT doc_id, media_type, byte_len,
        |    64 + (checksum % 1024)::INT AS width,
        |    64 + ((checksum // 1024) % 1024)::INT AS height,
        |    (1000 + checksum % 60000)::BIGINT AS duration_ms,
        |    checksum
        |  FROM fake)
        |ORDER BY doc_id""".stripMargin),

    // ---- feature extraction: 16-bin histogram. IMAGE rows: histogram over
    // REAL decoded pixel channel values (bin = v // 16, normalized by the
    // channel count w*h*3) — oracle recomputes from the expected-pixel
    // derivation. Audio/video: stub byte histogram, oracle replays
    // char-wise: bin = ascii // 16, f_b = count_b / max(len, 1). f_sum is
    // the same left-fold over bins 0..15 both branches (IEEE-identical). --
    "multimodal_features" -> QueryDef(
      (s, dir) => {
        featuresAll(decodableMediaTable(s, dir)).toDF()
          .selectExpr("doc_id", "round(features[0], 6) AS f0",
            "round(features[15], 6) AS f15",
            "round(aggregate(features, double(0), (a, x) -> a + x), 6) AS f_sum")
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      """WITH imgsrc AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    4 + (doc_id % 13) AS w, 4 + ((doc_id // 13) % 11) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |ibins AS (
        |  SELECT doc_id, w * h * 3 AS m,
        |    list_transform(range(0, w * h * 3),
        |      k -> (CASE WHEN length(text) = 0 THEN 0
        |                 ELSE ascii(substr(text, ((k % length(text)) + 1)::INT, 1)) END) // 16) AS bins
        |  FROM imgsrc),
        |ifeat AS (
        |  SELECT doc_id, list_transform(range(0, 16),
        |      b -> len(list_filter(bins, x -> x = b))::DOUBLE / m) AS f
        |  FROM ibins),
        |ch AS (
        |  SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      i -> ascii(substr(text, i, 1)) // 16) AS bins
        |  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents
        |        WHERE doc_id % 3 != 0)),
        |hist AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16),
        |      b -> len(list_filter(bins, x -> x = b))::DOUBLE / greatest(n, 1)) AS f
        |  FROM ch),
        |allf AS (SELECT doc_id, f FROM ifeat UNION ALL SELECT doc_id, f FROM hist)
        |SELECT doc_id, round(f[1], 6) AS f0, round(f[16], 6) AS f15,
        |  round(list_reduce(list_prepend(0.0::DOUBLE, f), (a, b) -> a + b), 6) AS f_sum
        |FROM allf ORDER BY doc_id""".stripMargin),

    // ---- resize: deterministic byte downsample (stub kernel; real
    // executor-side single-pass shape). Oracle replays the stride walk
    // char-wise over the same ASCII bytes. ----------------------------------
    "multimodal_resize" -> QueryDef(
      (s, dir) => {
        resizeAll(mediaTable(s, dir)).toDF()
          .select(col("doc_id"), col("in_len"), col("out_len"), col("resized_checksum"))
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      """WITH m AS (
        |  SELECT doc_id, length(text) AS n,
        |    greatest(1, (length(text) + 63) // 64) AS stride
        |  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)),
        |walk AS (
        |  SELECT doc_id, n, stride,
        |    range(1, n + 1, stride) AS idx
        |  FROM m)
        |SELECT w.doc_id, w.n AS in_len,
        |  len(w.idx)::INT AS out_len,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(w.idx, i -> ascii(substr(d.text, i, 1))::BIGINT)),
        |    (h, b) -> (h * 31 + b) % 1000000007) AS resized_checksum
        |FROM walk w JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    // ---- frame sampling: explode binary into per-frame rows ---------------
    "multimodal_frames" -> QueryDef(
      (s, dir) => {
        sampleFrames(mediaTable(s, dir)).toDF()
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            max(col("offset").cast("long")).as("last_offset"),
            sum(length(col("frame_bytes")).cast("long")).as("total_frame_bytes"))
          .orderBy("doc_id")
      },
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS len FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)),
        |f AS (SELECT doc_id, unnest(range(0, greatest(len - 16 + 1, 0), 64)) AS off, len
        |  FROM m WHERE len >= 16)
        |SELECT doc_id, COUNT(*) AS n_frames, MAX(off) AS last_offset,
        |  CAST(SUM(16) AS BIGINT) AS total_frame_bytes
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // ---- perceptual-hash duplicate grouping over media ------------------
    // The production image-dedup shape: per-media 60-bit pHash, then
    // GROUP BY (media_type, phash) — a map pass plus ONE combiner-friendly
    // aggregation, no self-join, output linear in media count (the same
    // scalable output form as dedup_exact). The stub pHash is b-bit
    // MinHash: 4 low bits from each of 15 signature lanes (60 bits -- the simhash60 headroom rule: lane 15 at shift 60 would overflow int64) over the
    // codec-derived payload, so near-identical payloads collide
    // (per-lane match ≈ jaccard) while unrelated media agree with
    // probability ≈ (j + (1-j)/16)^16 ≈ 4e-5 even on this deliberately
    // self-similar fixture corpus. A real DCT pHash drops in without
    // touching the grouping; two stub designs were REJECTED first —
    // byte-histogram thresholds and 16-bit parities both collapsed on the
    // shared-vocabulary fixture (every same-type pair collided /
    // 25% of pairs within radius 2). Hamming-radius banding at a wider
    // hash is the recall knob; its plumbing is dedup_simhash_pairs'. ------
    "multimodal_phash_dedup" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        mediaTable(s, dir).toDF()
          .selectExpr("doc_id", "media_type", "decode(content, 'UTF-8') AS payload")
          // same >= 3-token guard as the MinHash family (empty shingle
          // sets have no signature on either engine)
          .filter("size(graft_token_hashes(payload)) >= 3")
          .selectExpr("doc_id", "media_type", "graft_minhash_sig(payload) AS sig")
          .selectExpr("doc_id", "media_type",
            """aggregate(sequence(0, 14), 0L,
              |  (a, j) -> a + shiftleft(element_at(sig, CAST(j AS INT) + 1) % 16,
              |                          CAST(j AS INT) * 4)) AS phash""".stripMargin)
          .groupBy(col("media_type"), col("phash"))
          .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("canonical_id"))
          .filter(col("group_size") >= 2)
          .transform(graft.Sorted.byNames(_, "media_type", "phash"))
      },
      s"""WITH ${Dedup.duckSigCtes},
         |ph AS (SELECT doc_id,
         |    ['image','audio','video'][(doc_id % 3)::INT + 1] AS media_type,
         |    list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 15),
         |      j -> (sig[j::INT + 1] % 16) << (j::INT * 4))), (a, v) -> a + v) AS phash
         |  FROM sig)
         |SELECT media_type, phash, COUNT(*) AS group_size,
         |  MIN(doc_id) AS canonical_id
         |FROM ph GROUP BY media_type, phash HAVING COUNT(*) >= 2
         |ORDER BY media_type, phash""".stripMargin)
  )
}
