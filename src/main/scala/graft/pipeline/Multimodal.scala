package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata, and run decode / feature-extraction as a batched
  * per-partition transform.
  *
  * Three tiers, clearly separated:
  *
  *  - REAL, pixel-level: [[decodeImage]]/[[resizeImage]] decode actual
  *    image bytes through the JDK's own `javax.imageio` (PNG/BMP/GIF/
  *    JPEG readers ship with the JVM — no external codec needed) and
  *    emit integer-exact features (dims, luminance sum, aHash
  *    perceptual fingerprint) / nearest-neighbor resamples.
  *  - REAL, header-level: [[imageMeta]]/[[audioMeta]] parse container
  *    headers (PNG/JPEG/GIF/BMP, WAV/FLAC) byte-by-byte — the
  *    resolution/sample-rate pre-filter an ingest runs before decode.
  *  - STUB: [[decodeStub]] remains the documented deterministic fake
  *    for media ImageIO cannot read (video, non-WAV audio payloads) —
  *    the batched plumbing around it is the real part it demonstrates.
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Decoded(doc_id: Long, byte_len: Long, head_codes: String,
      fake_width: Long, fake_height: Long)

  /** documents → binary payload column (utf-8 bytes stand in for media) */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("media_meta"))

  /** STUB "decoder": batched per-partition transform with the shape of a
    * real media decode (read bytes → emit typed features). Deterministic
    * fake: byte length, first-4 byte codes, and dimensions derived from
    * the length. */
  def decodeStub(payload: Array[Byte]): (Long, String, Long, Long) = {
    // ??? real implementation would decode image/audio here (e.g. via a
    // JNI codec or, in PySpark, a Pandas UDF over mapInPandas); the
    // surrounding plumbing is what this operator tests.
    val len = payload.length.toLong
    val head = payload.take(4).map(b => (b & 0xff).toString).mkString(",")
    (len, head, len % 640, (len * 7) % 480)
  }

  /** decode features, partition-parallel */
  def decoded(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Payload] = payloads(docs)
      .select(col("doc_id"), col("payload")).as[Payload]
    ds.mapPartitions { it =>
      it.map { p =>
        val (len, head, w, h) = decodeStub(p.payload)
        Decoded(p.doc_id, len, head, w, h)
      }
    }.toDF()
  }

  final case class Resized(doc_id: Long, src_w: Long, src_h: Long,
      out_w: Long, out_h: Long)

  /** fit-within-box resize of the decoded (fake) image dimensions —
    * integer-only math (`floor(w*th/h)` style) so any engine reproduces
    * the output exactly; a real implementation would also emit the
    * resampled pixels from the same batched loop. Degenerate sources
    * (zero-area) pass through as 0×0 rather than erroring the batch. */
  def resized(spark: SparkSession, docs: DataFrame,
      targetW: Long = 128, targetH: Long = 96): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Payload] = payloads(docs)
      .select(col("doc_id"), col("payload")).as[Payload]
    ds.mapPartitions { it =>
      it.map { p =>
        val (len, _, w, h) = decodeStub(p.payload)
        val (ow, oh) =
          if (w <= 0 || h <= 0) (0L, 0L)
          else if (w * targetH <= h * targetW) (w * targetH / h, targetH)
          else (targetW, h * targetW / w)
        Resized(p.doc_id, w, h, ow, oh)
      }
    }.toDF()
  }

  // ---- REAL image metadata extraction (no codec needed) ----

  final case class ImageMeta(format: String, width: Long, height: Long,
      bit_depth: Long)

  /** Parse REAL image container headers from raw bytes — PNG IHDR, JPEG
    * SOF segment walk, GIF logical screen, BMP DIB — returning
    * format/width/height/bit-depth without any codec: pure byte-offset
    * arithmetic over the container spec, exactly what a multimodal
    * ingest pipeline runs to filter by resolution/aspect BEFORE paying
    * for a decode. Unlike [[decodeStub]] this is not a stub: feed it a
    * real file's bytes and it reports the real dimensions. Returns None
    * for anything it cannot positively identify (truncated or foreign
    * payloads never throw — a corrupt row must not fail a 100 TB scan). */
  def imageMeta(p: Array[Byte]): Option[ImageMeta] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
    def le16(i: Int): Long = ((u8(i + 1) << 8) | u8(i)).toLong
    def le32(i: Int): Long =
      ((u8(i + 3).toLong << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i))
    try {
      if (p.length >= 33 &&
          p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
          p(4) == 0x0d && p(5) == 0x0a && p(6) == 0x1a && p(7) == 0x0a &&
          p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        Some(ImageMeta("png", be32(16), be32(20), u8(24).toLong))
      else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // walk JPEG segments to the first frame header (SOFn, excluding
        // DHT/DNL/DAC which share the SOF numbering range)
        var i = 2
        var out: Option[ImageMeta] = None
        while (out.isEmpty && i + 9 < p.length && u8(i) == 0xff) {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill bytes before a marker are legal
          else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
            out = Some(ImageMeta("jpeg", be16(i + 7), be16(i + 5), u8(i + 4).toLong))
          else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01)
            i += 2 // standalone markers carry no length field
          else i += 2 + be16(i + 2).toInt
        }
        out
      } else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
          p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
        Some(ImageMeta("gif", le16(6), le16(8), 8L))
      else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
        // width/height are SIGNED int32 (negative height = top-down rows)
        Some(ImageMeta("bmp", le32(18).toInt.toLong,
          math.abs(le32(22).toInt).toLong,
          if (p.length >= 30) le16(28) else 0L))
      else None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  final case class DocImageMeta(doc_id: Long, format: String, width: Long,
      height: Long, bit_depth: Long)

  /** Batched header extraction over a binary payload column — the same
    * partition-parallel shape as [[decoded]], but the parse is real.
    * Unidentifiable payloads are dropped (flatMap), never fail the scan. */
  def imageMetas(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        it.flatMap { p =>
          imageMeta(p.payload).map(m =>
            DocImageMeta(p.doc_id, m.format, m.width, m.height, m.bit_depth))
        }
      }.toDF()
  }

  /** Deterministic minimal PNG bytes (signature + IHDR) carrying the
    * given dimensions — a REAL parseable header, used by the gate to
    * plant known dimensions in binary payloads that [[imageMeta]] must
    * recover. (CRC left zeroed: header parsing does not checksum.) */
  def pngHeaderBytes(width: Long, height: Long, bitDepth: Int = 8): Array[Byte] = {
    val out = new Array[Byte](33)
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    for (i <- sig.indices) out(i) = sig(i).toByte
    out(11) = 13 // IHDR payload length (big-endian 13)
    out(12) = 'I'.toByte; out(13) = 'H'.toByte; out(14) = 'D'.toByte; out(15) = 'R'.toByte
    def putBe32(i: Int, v: Long): Unit = {
      out(i) = ((v >> 24) & 0xff).toByte; out(i + 1) = ((v >> 16) & 0xff).toByte
      out(i + 2) = ((v >> 8) & 0xff).toByte; out(i + 3) = (v & 0xff).toByte
    }
    putBe32(16, width); putBe32(20, height)
    out(24) = bitDepth.toByte; out(25) = 2 // truecolor
    out
  }

  /** Minimal JPEG bytes: SOI, an APP0 segment to exercise the segment
    * walk, then SOF0 carrying the dimensions. */
  def jpegHeaderBytes(width: Long, height: Long): Array[Byte] = {
    val app0 = Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46) // 4-byte APP0
    val sof = Array(0xff, 0xc0, 0x00, 0x11, 0x08,
      ((height >> 8) & 0xff).toInt, (height & 0xff).toInt,
      ((width >> 8) & 0xff).toInt, (width & 0xff).toInt, 0x03)
    (Array(0xff, 0xd8) ++ app0 ++ sof).map(_.toByte)
  }

  /** Minimal GIF89a logical-screen header. */
  def gifHeaderBytes(width: Long, height: Long): Array[Byte] =
    ("GIF89a".getBytes("US-ASCII") ++ Array(
      (width & 0xff).toInt, ((width >> 8) & 0xff).toInt,
      (height & 0xff).toInt, ((height >> 8) & 0xff).toInt).map(_.toByte))

  /** Minimal BMP file+DIB header (BITMAPINFOHEADER layout). */
  def bmpHeaderBytes(width: Long, height: Long, bitCount: Int = 24): Array[Byte] = {
    val out = new Array[Byte](30)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(14, 40) // DIB header size
    putLe32(18, width); putLe32(22, height)
    out(26) = 1 // planes
    out(28) = (bitCount & 0xff).toByte; out(29) = ((bitCount >> 8) & 0xff).toByte
    out
  }

  // ---- REAL pixel decode (JDK ImageIO — no external codec) ----

  // AWT raster ops are headless-safe, but pin the flag before any
  // ImageIO classloading so no executor ever probes for a display
  System.setProperty("java.awt.headless", "true")

  final case class DecodedImage(doc_id: Long, width: Long, height: Long,
      sum_gray: Long, ahash_lo: Long, ahash_hi: Long)

  /** REAL image decode via the JDK's own `javax.imageio` (PNG/BMP/GIF/
    * JPEG readers ship with the JVM — `decodeStub` predates this and
    * remains only as the documented fake for formats ImageIO lacks):
    * decodes the payload to pixels and emits integer-exact features —
    * dimensions, the luminance sum, and the 64-bit aHash perceptual
    * fingerprint (8×8 average-hash: bit j set iff pixel j's luminance
    * beats the image mean; the standard near-dup fingerprint for
    * images), split into two 32-bit halves so any engine can recompute
    * it without signed-shift edge cases. Luminance is the integer
    * Rec.601 form (299r+587g+114b)/1000 — exact, no floats anywhere.
    * Returns None on undecodable payloads; never throws. */
  def decodeImage(docId: Long, payload: Array[Byte]): Option[DecodedImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val lum = Array.ofDim[Long](w * h)
        var sum = 0L
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val l = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            lum(i) = l; sum += l; i += 1; x += 1
          }
          y += 1
        }
        // aHash over the first 8x8 pixels (row-major bit j = y*8+x),
        // threshold = the full-image mean, compared exactly via
        // l * n > sum (no division)
        val n = (w * h).toLong
        var lo = 0L; var hi = 0L
        var by = 0
        while (by < math.min(8, h)) {
          var bx = 0
          while (bx < math.min(8, w)) {
            val j = by * 8 + bx
            if (lum(by * w + bx) * n > sum) {
              if (j < 32) lo |= (1L << j) else hi |= (1L << (j - 32))
            }
            bx += 1
          }
          by += 1
        }
        Some(DecodedImage(docId, w.toLong, h.toLong, sum, lo, hi))
      }
    } catch { case _: Exception => None }

  final case class ResizedImage(doc_id: Long, out_w: Long, out_h: Long,
      sum_gray: Long)

  /** REAL resize: decode the payload (JDK ImageIO), nearest-neighbor
    * resample with the EXPLICIT integer mapping src = (dst·srcDim)/dstDim
    * — deterministic and engine-replayable, unlike library resamplers
    * whose rounding conventions vary — and emit the resized image's
    * luminance sum. A production variant would also re-encode the pixels
    * from this same loop; the features prove the resample is real. */
  def resizeImage(docId: Long, payload: Array[Byte], tw: Int,
      th: Int): Option[ResizedImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || tw <= 0 || th <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < th) {
          val sy = y * h / th
          var x = 0
          while (x < tw) {
            val sx = x * w / tw
            val rgb = img.getRGB(sx, sy)
            sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        Some(ResizedImage(docId, tw.toLong, th.toLong, sum))
      }
    } catch { case _: Exception => None }

  /** batched REAL resize over a binary payload column */
  def resizeImages(spark: SparkSession, payloads: DataFrame, tw: Int,
      th: Int): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions(_.flatMap(p => resizeImage(p.doc_id, p.payload, tw, th)))
      .toDF()
  }

  /** batched REAL decode over a binary payload column */
  def decodeImages(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions(_.flatMap(p => decodeImage(p.doc_id, p.payload)))
      .toDF()
  }

  /** Deterministic 8×8 gray PNG whose pixel (x,y) carries luminance
    * `(seed*7 + x*3 + y*5) % 256` — REAL encoded bytes (JDK PNG writer)
    * that [[decodeImage]] must decode back to the arithmetic pattern. */
  def grayPatternPng(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = ((seed * 7 + x * 3 + y * 5) % 256).toInt
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- REAL audio metadata extraction (no codec needed) ----

  final case class AudioMeta(format: String, sample_rate: Long,
      channels: Long, bits_per_sample: Long)

  /** Parse REAL audio container headers — RIFF/WAVE (chunk walk to the
    * `fmt ` chunk) and FLAC (STREAMINFO bit unpacking) — returning
    * sample-rate/channels/bit-depth without decoding a sample: the
    * duration/quality pre-filter an audio ingest runs before resampling.
    * None on anything unidentifiable; never throws on truncation. */
  def audioMeta(p: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Long = ((u8(i + 1) << 8) | u8(i)).toLong
    def le32(i: Int): Long =
      ((u8(i + 3).toLong << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i))
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= p.length && s.indices.forall(j => p(i + j) == s(j).toByte)
    try {
      if (ascii(0, "RIFF") && ascii(8, "WAVE")) {
        // walk chunks to `fmt ` (it need not be first; LIST/JUNK chunks
        // legally precede it); chunks are word-aligned
        var i = 12
        var out: Option[AudioMeta] = None
        while (out.isEmpty && i + 8 <= p.length) {
          val size = le32(i + 4)
          if (ascii(i, "fmt ") && i + 24 <= p.length)
            out = Some(AudioMeta("wav", le32(i + 12), le16(i + 10),
              le16(i + 22)))
          else i += 8 + size.toInt + (size.toInt & 1)
        }
        out
      } else if (ascii(0, "fLaC") && p.length >= 22 && (u8(4) & 0x7f) == 0) {
        // STREAMINFO at 8: sample rate = 20 bits at byte 18, then 3-bit
        // channels-1, 5-bit bps-1 packed across bytes 20-21
        val sr = (u8(18).toLong << 12) | (u8(19) << 4) | (u8(20) >> 4)
        val ch = ((u8(20) >> 1) & 0x7) + 1L
        val bps = (((u8(20) & 1) << 4) | (u8(21) >> 4)) + 1L
        Some(AudioMeta("flac", sr, ch, bps))
      } else None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  final case class DocAudioMeta(doc_id: Long, format: String,
      sample_rate: Long, channels: Long, bits_per_sample: Long)

  /** batched header extraction, partition-parallel, parse failures
    * dropped — the audio twin of [[imageMetas]] */
  def audioMetas(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        it.flatMap { p =>
          audioMeta(p.payload).map(m => DocAudioMeta(p.doc_id, m.format,
            m.sample_rate, m.channels, m.bits_per_sample))
        }
      }.toDF()
  }

  /** Minimal RIFF/WAVE bytes with a JUNK chunk BEFORE `fmt ` so the gate
    * exercises the chunk walk, not a fixed offset. */
  def wavHeaderBytes(sampleRate: Long, channels: Int,
      bitsPerSample: Int = 16): Array[Byte] = {
    val junkLen = 6 // even, so no pad byte
    val out = new Array[Byte](12 + 8 + junkLen + 24)
    def put(i: Int, s: String): Unit = s.indices.foreach(j => out(i + j) = s(j).toByte)
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    put(0, "RIFF"); putLe32(4, out.length - 8L); put(8, "WAVE")
    put(12, "JUNK"); putLe32(16, junkLen)
    val f = 12 + 8 + junkLen
    put(f, "fmt "); putLe32(f + 4, 16); putLe16(f + 8, 1)
    putLe16(f + 10, channels); putLe32(f + 12, sampleRate)
    putLe32(f + 16, sampleRate * channels * bitsPerSample / 8)
    putLe16(f + 20, channels * bitsPerSample / 8)
    putLe16(f + 22, bitsPerSample)
    out
  }

  /** Minimal FLAC magic + STREAMINFO carrying the given stream params. */
  def flacHeaderBytes(sampleRate: Long, channels: Int,
      bitsPerSample: Int = 16): Array[Byte] = {
    val out = new Array[Byte](42) // 4 magic + 4 block header + 34 streaminfo
    "fLaC".indices.foreach(i => out(i) = "fLaC"(i).toByte)
    out(4) = 0x80.toByte // last-metadata-block flag + type 0 (STREAMINFO)
    out(7) = 34
    out(18) = ((sampleRate >> 12) & 0xff).toByte
    out(19) = ((sampleRate >> 4) & 0xff).toByte
    out(20) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    out(21) = (((bitsPerSample - 1) & 0xf) << 4).toByte
    out
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Long, width: Long,
    height: Long, sum_gray: Long, frame_fp: Long)

  /** REAL multi-frame container decode — strided frame sampling over an
    * animated GIF through the JDK's own ImageIO reader (the one
    * multi-frame container the JRE decodes without external codecs;
    * compressed video needs an ffmpeg-class dependency this environment
    * doesn't ship, but the frame-extraction plumbing — container walk,
    * per-frame decode, strided sampling, integer features — is identical
    * and fully exercised here). Emits width/height and the integer-exact
    * gray sum per sampled frame; anything undecodable yields no rows,
    * never a throw. */
  def videoFrames(docId: Long, payload: Array[Byte], stride: Int = 2): Seq[VideoFrame] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          try {
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          val md5 = java.security.MessageDigest.getInstance("MD5")
          (0 until n by stride).map { i =>
            val img = reader.read(i)
            var s = 0L
            // frame fingerprint: 60-bit md5 of the row-major gray CSV —
            // a COLLISION-RESISTANT identity (the integer gray sum lives
            // in a ~16k value space; at 50k videos a sum-keyed inverted
            // index drowns in collision buckets — measured 393 s at 10×
            // before this fp existed). CSV-of-integers keeps the hash
            // replayable by any engine (the oracle rebuilds the same
            // string arithmetically).
            val csv = new java.lang.StringBuilder(img.getWidth * img.getHeight * 4)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val g = (img.getRGB(x, y) >> 16) & 0xff
                s += g
                if (csv.length > 0) csv.append(',')
                csv.append(g)
                x += 1
              }
              y += 1
            }
            md5.reset()
            val hex = md5
              .digest(csv.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString
            VideoFrame(docId, i.toLong, img.getWidth.toLong,
              img.getHeight.toLong, s,
              java.lang.Long.parseLong(hex.substring(0, 15), 16))
          }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** batched one-to-many frame extraction over (doc_id, payload) rows */
  def videoFrameSamples(spark: SparkSession, payloadRows: DataFrame,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    payloadRows.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions(_.flatMap(p => videoFrames(p.doc_id, p.payload, stride)))
      .toDF()
  }

  /** Deterministic animated 8×8 gray GIF: frame i pixel (x,y) carries
    * `(seed*7 + i*11 + x*3 + y*5) % 256` — REAL encoded bytes (JDK GIF
    * sequence writer) that [[videoFrames]] must decode back to the
    * arithmetic pattern. The raster is INDEXED with an identity 256-gray
    * palette so values survive the GIF round trip bit-exactly (a
    * TYPE_BYTE_GRAY raster would pass through a gray→sRGB colorspace
    * conversion and come back shifted). */
  def grayPatternGif(seed: Long, nFrames: Int = 6): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until 8; x <- 0 until 8)
        img.getRaster.setSample(x, y, 0,
          ((seed * 7 + i * 11 + x * 3 + y * 5) % 256).toInt)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** [[grayPatternGif]] with an explicit per-frame seed list: frame i
    * pixel (x,y) carries
    * `(seed*7 + (seed/256)*11*(y*8+x) + x*3 + y*5) % 256` — same seed ⇒
    * bit-identical frame, and the (seed/256) per-pixel mixing term keeps
    * DISTINCT seeds producing distinct frames across a ~65k seed window
    * (a pattern driven by `seed % 256` alone collapses every corpus to
    * 256 frame identities, which floods any fingerprint index with
    * same-content buckets — measured as a 393 s pair join at 10×). */
  def grayPatternGifSeeds(seeds: Seq[Long]): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (seed <- seeds) {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until 8; x <- 0 until 8)
        img.getRaster.setSample(x, y, 0,
          ((seed * 7 + (seed / 256) * 11 * (y * 8 + x) + x * 3 + y * 5) % 256).toInt)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** Video near-duplicate pairs by FRAME-SET overlap — the shot-level
    * dedup a video pipeline runs: fingerprint every sampled frame (the
    * 60-bit md5 `frame_fp` from the real decode; a perceptual hash slots
    * into the same shape for near-identical-frame tolerance), collect
    * each video's distinct fingerprint set, and score candidate pairs by
    * exact Jaccard.
    * Candidates come from an inverted index on the fingerprint (videos
    * sharing ANY frame meet in one bucket) — never a quadratic pass.
    *
    * Hot-fingerprint guard: a frame shared by B videos makes its bucket a
    * B² candidate task, and real corpora have genuinely common frames
    * (black frames, intro cards) — the structural failure mode behind the
    * r7 393 s incident. Fingerprints whose document frequency exceeds
    * `maxFrameDf` are dropped from CANDIDATE GENERATION only (the exact
    * Jaccard verify still scores the FULL frame sets), the same
    * document-frequency posture as `topNgrams`' boilerplate cut. The hot
    * list is ≤ totalFrames/maxFrameDf entries by construction, so the
    * broadcast stays bounded at any corpus size; per-fingerprint candidate
    * volume is capped at maxFrameDf². Pairs overlapping ONLY on
    * boilerplate frames are by design not candidates.
    * Expects [[videoFrameSamples]] output. */
  def frameJaccardPairs(frames: DataFrame, threshold: Double = 0.45,
      maxFrameDf: Int = 1000): DataFrame = {
    val sets = frames.groupBy("doc_id")
      .agg(collect_set(col("frame_fp")).as("codes"))
    val cand = frameCandidates(sets, maxFrameDf).distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("codes").as("ca")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("codes").as("cb")), Seq("doc_b"))
      .withColumn("jac", size(array_intersect(col("ca"), col("cb"))).cast("double") /
        size(array_union(col("ca"), col("cb"))))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
  }

  /** Pre-distinct candidate stream of [[frameJaccardPairs]], exposed so
    * the forced-collision spec can assert the raw candidate VOLUME the
    * hot-fingerprint guard bounds (not just the deduped pair set).
    * `sets` is (doc_id, codes) — the per-video fingerprint sets. */
  private[pipeline] def frameCandidates(sets: DataFrame, maxFrameDf: Int): DataFrame = {
    val ex = sets.select(col("doc_id"), explode(col("codes")).as("code"))
    val hot = ex.groupBy("code").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxFrameDf).select("code")
    val exC = ex.join(broadcast(hot), Seq("code"), "left_anti")
    exC.select(col("code"), col("doc_id").as("doc_a"))
      .join(exC.select(col("code"), col("doc_id").as("doc_b")), Seq("code"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
  }

  final case class VideoMeta(format: String, brand: String, timescale: Long,
      duration_ms: Long, n_tracks: Long, video_codec: String, width: Long,
      height: Long, n_keyframes: Long)

  /** Codec-free MP4 / ISO-BMFF container metadata: a moov/trak/stbl box
    * walk over raw bytes (ISO/IEC 14496-12 box grammar — 32-bit BE size +
    * fourcc; size 1 ⇒ 64-bit largesize; size 0 ⇒ to-end-of-file)
    * recovering the major brand, the movie timescale/duration, the track
    * count, the video track's sample-entry codec fourcc and pixel
    * dimensions (tkhd 16.16 fixed point), and its sync-sample (keyframe)
    * count from stss. This is the duration/resolution/keyframe pre-filter
    * a video ingest runs across a corpus BEFORE paying for any
    * ffmpeg-class decode — the same headers-are-real, samples-never-
    * decoded posture as [[imageMeta]]/[[audioMeta]]. None on anything
    * unidentifiable; never throws on truncation (a short box simply ends
    * the walk). The reference has no video path; this extends the
    * multimodal family. */
  def videoMeta(p: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String = new String(p, i, 4, "ISO-8859-1")
    /** children of [start, end) as (type, payloadStart, payloadEnd);
      * stops cleanly at the first truncated or inconsistent box */
    def walk(start: Int, end: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var i = start
      var bad = false
      while (!bad && i + 8 <= end) {
        var sz = be32(i)
        var hdr = 8
        if (sz == 1 && i + 16 <= end) { sz = be64(i + 8); hdr = 16 }
        else if (sz == 0) sz = (end - i).toLong
        if (sz < hdr || sz > end - i) bad = true
        else {
          out += ((fourcc(i + 4), i + hdr, i + sz.toInt))
          i += sz.toInt
        }
      }
      out.result()
    }
    try {
      val top = walk(0, p.length)
      val ftyp = top.find(_._1 == "ftyp")
      val moov = top.find(_._1 == "moov")
      if (ftyp.isEmpty || moov.isEmpty) return None
      val brand = fourcc(ftyp.get._2)
      val mb = walk(moov.get._2, moov.get._3)
      val (ts, durMs) = mb.find(_._1 == "mvhd").map { case (_, s, _) =>
        // version 1 widens creation/modification/duration to 64 bits
        if (u8(s) == 1) (be32(s + 20), be64(s + 24) * 1000 / math.max(1L, be32(s + 20)))
        else (be32(s + 12), be32(s + 16) * 1000 / math.max(1L, be32(s + 12)))
      }.getOrElse((0L, 0L))
      val traks = mb.filter(_._1 == "trak")
      var codec = ""
      var w = 0L
      var h = 0L
      var keyframes = 0L
      for ((_, tks, tke) <- traks) {
        val tb = walk(tks, tke)
        val mdia = tb.find(_._1 == "mdia")
        val handler = mdia.flatMap { case (_, ms, me) =>
          walk(ms, me).find(_._1 == "hdlr")
            .map { case (_, hs, _) => fourcc(hs + 8) }
        }.getOrElse("")
        if (handler == "vide" && codec.isEmpty) {
          tb.find(_._1 == "tkhd").foreach { case (_, ks, _) =>
            val off = if (u8(ks) == 1) ks + 88 else ks + 76
            w = be32(off) >> 16
            h = be32(off + 4) >> 16
          }
          for {
            (_, ms, me) <- mdia.toList
            (t2, s2, e2) <- walk(ms, me) if t2 == "minf"
            (t3, s3, e3) <- walk(s2, e2) if t3 == "stbl"
          } {
            val sb = walk(s3, e3)
            sb.find(_._1 == "stsd").foreach { case (_, ss, _) =>
              codec = fourcc(ss + 12) }
            sb.find(_._1 == "stss").foreach { case (_, ss, _) =>
              keyframes = be32(ss + 4) }
          }
        }
      }
      Some(VideoMeta("mp4", brand, ts, durMs, traks.size.toLong, codec, w, h,
        keyframes))
    } catch { case _: IndexOutOfBoundsException => None }
  }

  final case class DocVideoMeta(doc_id: Long, format: String, brand: String,
      timescale: Long, duration_ms: Long, n_tracks: Long,
      video_codec: String, width: Long, height: Long, n_keyframes: Long)

  /** batched container-metadata extraction, partition-parallel, parse
    * failures dropped — the video twin of [[imageMetas]]/[[audioMetas]] */
  def videoMetas(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions(_.flatMap { p =>
        videoMeta(p.payload).map(m => DocVideoMeta(p.doc_id, m.format,
          m.brand, m.timescale, m.duration_ms, m.n_tracks, m.video_codec,
          m.width, m.height, m.n_keyframes))
      }).toDF()
  }

  /** Minimal-but-well-formed ISO-BMFF bytes: ftyp + moov(mvhd,
    * trak[video: tkhd dims, hdlr 'vide', stbl(stsd codec, stss keyframes)]
    * [, trak[audio: hdlr 'soun', stsd 'mp4a']]) + a stub mdat — the gate
    * fixture [[videoMeta]] must walk (boxes are nested and the video trak
    * is not always first, so fixed offsets don't survive). */
  def mp4Bytes(brand: String, timescale: Long, durationUnits: Long,
      width: Long, height: Long, codec: String, nKeyframes: Int,
      withAudio: Boolean): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      be32(8L + body.length) ++ fcc(tpe) ++ body
    }
    val ftyp = box("ftyp", fcc(brand), be32(0x200), fcc("mp41"))
    // mvhd v0: ver/flags, c/m times, timescale@12, duration@16, then
    // rate/volume/reserved/matrix/predefined/next-track zero padding
    val mvhd = box("mvhd", new Array[Byte](12), be32(timescale),
      be32(durationUnits), new Array[Byte](80))
    // tkhd v0: 76 bytes of fixed fields, then 16.16 width/height
    val tkhd = box("tkhd", new Array[Byte](76), be32(width << 16),
      be32(height << 16))
    def hdlr(kind: String) = box("hdlr", new Array[Byte](8), fcc(kind),
      new Array[Byte](13))
    def stsd(fourcc: String) = box("stsd", new Array[Byte](4), be32(1),
      be32(8), fcc(fourcc))
    val stss = box("stss", new Array[Byte](4), be32(nKeyframes.toLong),
      (0 until nKeyframes).toArray.flatMap(i => be32(i * 2L + 1)))
    val videoTrak = box("trak", tkhd,
      box("mdia", hdlr("vide"), box("minf", box("stbl", stsd(codec), stss))))
    val audioTrak = box("trak",
      box("mdia", hdlr("soun"), box("minf", box("stbl", stsd("mp4a")))))
    val moov =
      if (withAudio) box("moov", mvhd, videoTrak, audioTrak)
      else box("moov", mvhd, videoTrak)
    ftyp ++ moov ++ box("mdat", new Array[Byte](16))
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame_code: Long)

  /** frame sampling: treat the payload as a fake video of
    * `len / frameBytes` frames and emit every `stride`-th frame with a
    * deterministic per-frame fingerprint (first byte of the frame) — the
    * one-to-many batched shape of real video frame extraction. */
  def frameSamples(spark: SparkSession, docs: DataFrame,
      frameBytes: Int = 100, stride: Int = 5): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Payload] = payloads(docs)
      .select(col("doc_id"), col("payload")).as[Payload]
    ds.mapPartitions { it =>
      it.flatMap { p =>
        val nFrames = p.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          Frame(p.doc_id, i.toLong, (p.payload(i * frameBytes) & 0xff).toLong)
        }
      }
    }.toDF()
  }
}
