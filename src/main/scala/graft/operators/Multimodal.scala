package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal pure-JVM PPM (P6, maxval 255) raster codec — a REAL binary
  * image decode path with zero native/external dependencies (this
  * environment ships no image libraries; PPM is the simplest widely-used
  * raster format). Feeds [[Multimodal.imageStats]] /
  * [[Multimodal.resizeImage]]; heavier codecs (JPEG/PNG) plug into the
  * same mapPartitions shape via JNI/FFI in a full deployment. */
object PpmCodec {

  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} RGB bytes, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a P6 payload (whitespace/comment-tolerant header).
    * @return (width, height, interleaved RGB bytes) */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def token(): String = {
      skipWs()
      val s = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
      new String(bytes, s, i - s, "US-ASCII")
    }
    require(token() == "P6", "not a P6 PPM payload")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"unsupported maxval $maxval (8-bit only)")
    i += 1 // exactly one whitespace byte separates header from pixels
    require(bytes.length - i >= w * h * 3, "truncated pixel data")
    (w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3))
  }

  /** Nearest-neighbor resample (source pixel floor(x*w/outW, y*h/outH)). */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sp = (sy * w + x * w / outW) * 3
        val dp = (y * outW + x) * 3
        out(dp) = rgb(sp); out(dp + 1) = rgb(sp + 1); out(dp + 2) = rgb(sp + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}

/** JDK-ImageIO raster codec — the REAL-FILE face of the image path:
  * decodes any format a registered ImageIO reader handles (PNG and JPEG
  * ship with every JDK; no new dependency) into the same interleaved-RGB
  * buffer contract as [[PpmCodec]]. PNG round-trips losslessly, so the
  * PNG pipeline shares the closed-form pixel oracles; JPEG decodes
  * through the identical path but is gated by tolerance specs only (its
  * bytes are encoder-dependent). Instantiated per task inside
  * mapPartitions like the PPM codec. */
object ImageIoCodec {
  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  // ImageIO's default stream cache is FILE-backed: every encode/decode
  // creates and deletes a temp file, which under a slow or contended tmpfs
  // multiplies per-image cost ~7x (observed: m6 0.86 s -> 6 s for 1000
  // codec calls). All payloads here are in-memory byte arrays — use
  // memory-backed streams.
  ImageIO.setUseCache(false)

  /** Encode interleaved RGB to `format` ("png", "jpg", ...). */
  def encode(w: Int, h: Int, rgb: Array[Byte], format: String): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} RGB bytes, got ${rgb.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
        p += 3
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = encode(w, h, rgb, "png")

  /** Decode any ImageIO-readable payload (PNG/JPEG/GIF/BMP...) to
    * (width, height, interleaved RGB). Fails loudly on undecodable
    * bytes — a silent null here would surface as a task NPE far from
    * the cause. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload not decodable by any registered ImageIO reader")
    val w = img.getWidth
    val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        rgb(p) = (px >> 16).toByte
        rgb(p + 1) = (px >> 8).toByte
        rgb(p + 2) = px.toByte
        p += 3
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }
}

/** JDK-ImageIO animated-GIF codec — the VIDEO analog of the image path:
  * a real multi-frame container (GIF89a frame sequence) parsed frame by
  * frame through the JDK's reader; no new dependency. Frames are written
  * full-rect with an explicit 256-entry palette, so a frame sequence
  * whose pixels use palette colors round-trips bit-exactly (verified by
  * spec and the m8 closed-form oracle); arbitrary GIFs decode through
  * the same path with the usual palette quantization caveats. */
object GifCodec {
  import java.awt.image.{BufferedImage, IndexColorModel}
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.{IIOImage, ImageIO}

  // memory-backed ImageIO streams (see ImageIoCodec) — without this every
  // createImage{Input,Output}Stream call round-trips a temp file
  ImageIO.setUseCache(false)

  // 256-entry grayscale palette: index i -> rgb(i, i, i)
  private def grayPalette: IndexColorModel = {
    val g = Array.tabulate[Byte](256)(_.toByte)
    new IndexColorModel(8, 256, g, g, g)
  }

  /** Encode gray frames (each w*h bytes, one gray level per pixel) into
    * one animated GIF payload. */
  def encodeFrames(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == w * h, s"expected ${w * h} gray bytes"))
    val icm = grayPalette
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // sequential row order: the JDK writer interlaces by default, and a
      // 3-row interlaced frame round-trips wrong through its own reader
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      frames.foreach { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var p = 0
        while (p < w * h) { raster.setSample(p % w, p / w, 0, f(p) & 0xff); p += 1 }
        writer.writeToSequence(new IIOImage(img, null, null), param)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Decode every frame of a GIF payload to interleaved RGB (same buffer
    * contract as [[ImageIoCodec.decode]], one buffer per frame). Each
    * frame is decoded exactly once, and every frame's rect must match
    * frame 0's — sub-rect animated GIFs (delta frames against a composite
    * canvas) fail loudly rather than returning buffers inconsistent with
    * the advertised dims; [[encodeFrames]] always writes full rects.
    * @return (width, height, frames) */
  def decodeFrames(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      require(n >= 1, "payload has no decodable GIF frames")
      var w = -1; var h = -1
      val frames = (0 until n).map { f =>
        val img = reader.read(f)
        if (f == 0) { w = img.getWidth; h = img.getHeight }
        else require(img.getWidth == w && img.getHeight == h,
          s"frame $f rect ${img.getWidth}x${img.getHeight} != frame 0 rect " +
            s"${w}x$h — sub-rect delta frames need canvas compositing")
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            rgb(p) = (px >> 16).toByte; rgb(p + 1) = (px >> 8).toByte; rgb(p + 2) = px.toByte
            p += 3
            x += 1
          }
          y += 1
        }
        rgb
      }
      (w, h, frames)
    } finally reader.dispose()
  }
}

/** Minimal pure-JVM RIFF/WAVE codec (PCM 16-bit mono, little-endian) —
  * the AUDIO analog of [[PpmCodec]]: a real binary container parse with
  * zero native dependencies. The decoder walks the chunk list (tolerating
  * unknown chunks such as LIST/INFO metadata, as real-world WAV files
  * carry), validates the fmt block, and returns the decoded samples. */
object WavCodec {

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** Encode PCM16 mono samples into a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))            // PCM
    out.write(le16(1))            // mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2)) // byte rate
    out.write(le16(2))            // block align
    out.write(le16(16))           // bits/sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Decode a WAV payload; walks chunks in any order, skipping unknown
    * ones. @return (sampleRate, samples) */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var i = 12
    var rate = -1
    var data: Array[Short] = null
    while (i + 8 <= bytes.length && (rate < 0 || data == null)) {
      val id = tag(i); val len = u32(i + 4); val body = i + 8
      require(len >= 0 && body.toLong + len <= bytes.length, s"truncated '$id' chunk")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          require(u16(body) == 1, "only PCM (format 1) supported")
          require(u16(body + 2) == 1, "only mono supported")
          require(u16(body + 14) == 16, "only 16-bit samples supported")
          rate = u32(body + 4)
        case "data" =>
          data = Array.tabulate(len / 2)(j => u16(body + j * 2).toShort)
        case _ => // unknown chunk (LIST, fact, ...) — skip
      }
      i = body + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    (rate, data)
  }
}

/** Multimodal column plumbing: media (image/audio/video) is carried as an
  * opaque `binary` payload column plus typed metadata, and per-batch
  * feature extraction runs in `mapPartitions` over the raw bytes — the
  * same shape a real decoder (JNI/FFI image lib) would use. The IMAGE
  * path is real end-to-end and format-sniffing ([[decodeAny]]): P6
  * payloads go through the zero-dependency [[PpmCodec]], everything else
  * (PNG/JPEG/GIF/BMP) through [[ImageIoCodec]] — one operator surface
  * ([[extractImageFeatures]], [[imageStats]], [[resizeImage]],
  * [[resizeFingerprint]]) over any container (oracle-gated: encode →
  * decode → features / resample must match closed-form SQL over the
  * synthetic pixel formulas; PNG shares the same oracles because it is
  * lossless). Only [[sampleFrames]] keeps a digest fingerprint — its
  * subject is the frame-splitting shape, not a codec.
  */
object Multimodal {

  /** Container sniff + decode: "P6" magic → [[PpmCodec]], anything else
    * → [[ImageIoCodec]]. One decoder contract for every image operator,
    * so a corpus can mix PPM/PNG/JPEG payloads in one binary column. */
  def decodeAny(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    if (bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte)
      PpmCodec.decode(bytes)
    else ImageIoCodec.decode(bytes)

  /** Frame sampling: split the payload into fixed-size frames (the
    * video-frame / audio-window analog) and fingerprint each — the
    * per-frame feature-extraction shape with the decode stubbed as md5.
    * Character-based frames so the operator is reproducible in plain SQL.
    * Output: (doc_id, frame_idx 1-based, frame_md5). */
  def sampleFrames(docs: DataFrame, frameChars: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Column
    val nFrames = ceil(length(col(textCol)) / lit(frameChars.toDouble)).cast("int")
    val frames: Column = transform(
      sequence(lit(1), greatest(nFrames, lit(1))),
      i => md5(col(textCol).substr((i - 1) * frameChars + 1, lit(frameChars))))
    docs
      .select(col(idCol).as("doc_id"), posexplode(frames).as(Seq("pos", "frame_md5")))
      .select(col("doc_id"), (col("pos") + 1).as("frame_idx"), col("frame_md5"))
  }

  case class DecodedFeatures(
      doc_id: Long, width: Int, height: Int, byte_len: Long, rgb_sha256: String)

  /** REAL decode + feature extraction over the binary payload: the codec
    * parses the container and the features fingerprint the DECODED pixel
    * buffer (lowercase hex, sha256-hashed — a digest both engines can
    * compute), proving the bytes went through the decoder rather than
    * being hashed raw. Decoder + digest instantiated once per task. */
  def extractImageFeatures(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val digest = MessageDigest.getInstance("SHA-256")
        batch.map { case (id, bytes) =>
          val (w, h, rgb) = decodeAny(bytes)
          digest.reset()
          val hex = rgb.map("%02x".format(_)).mkString
          DecodedFeatures(id, w, h, bytes.length.toLong,
            digest.digest(hex.getBytes("US-ASCII")).map("%02x".format(_)).mkString)
        }
      }.toDF()
  }

  case class ResizedFingerprint(
      doc_id: Long, width: Int, height: Int, out_width: Int, out_height: Int,
      resized_sha256: String)

  /** REAL decode -> nearest-neighbor resize -> fingerprint of the RESIZED
    * pixel buffer (same hex-digest convention as
    * [[extractImageFeatures]]) — the thumbnail shape with the scaler's
    * exact output pinned, not just its statistics. */
  def resizeFingerprint(withPayload: DataFrame, outW: Int, outH: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val digest = MessageDigest.getInstance("SHA-256")
        batch.map { case (id, bytes) =>
          val (w, h, rgb) = decodeAny(bytes)
          val resized = PpmCodec.resizeNearest(w, h, rgb, outW, outH)
          digest.reset()
          val hex = resized.map("%02x".format(_)).mkString
          ResizedFingerprint(id, w, h, outW, outH,
            digest.digest(hex.getBytes("US-ASCII")).map("%02x".format(_)).mkString)
        }
      }.toDF()
  }

  case class ImageStats(
      doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  case class CroppedStats(
      doc_id: Long, width: Int, height: Int, out_width: Int, out_height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL decode -> CENTER CROP -> per-channel means — the
    * crop-to-square / focal-region step training pipelines run before
    * resize (a resize alone distorts aspect ratio; crop-then-resize is
    * the standard normalization). Offsets are the floor midpoints
    * ((w-cw)/2, (h-ch)/2) — deterministic integers, so a closed-form SQL
    * oracle replays every cropped pixel; crops larger than the image
    * clamp to the full axis. One map-side pass, zero shuffle (the d12
    * family's scale shape). */
  def centerCrop(withPayload: DataFrame, cropW: Int, cropH: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(cropW >= 1 && cropH >= 1, s"crop must be >= 1x1, got ${cropW}x$cropH")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, rgb) = decodeAny(bytes)
        val cw = math.min(cropW, w)
        val ch = math.min(cropH, h)
        val x0 = (w - cw) / 2
        val y0 = (h - ch) / 2
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            val p = ((y0 + y) * w + x0 + x) * 3
            sr += rgb(p) & 0xff; sg += rgb(p + 1) & 0xff; sb += rgb(p + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val n = cw.toDouble * ch
        CroppedStats(id, w, h, cw, ch, sr / n, sg / n, sb / n)
      }).toDF()
  }

  /** The closed-form synthetic pixel buffer shared by every synthetic
    * payload generator: r=(id*31+p)%256, g=(id*17+2p+5)%256,
    * b=(id*13+3p+11)%256 over pixel index p. */
  private def syntheticRgb(id: Long, n: Int): Array[Byte] = {
    val rgb = new Array[Byte](n * 3)
    var p = 0
    while (p < n) {
      rgb(p * 3) = ((id * 31 + p) % 256).toByte
      rgb(p * 3 + 1) = ((id * 17 + 2L * p + 5) % 256).toByte
      rgb(p * 3 + 2) = ((id * 13 + 3L * p + 11) % 256).toByte
      p += 1
    }
    rgb
  }

  /** Deterministic synthetic P6 payload per row — pixel channels are
    * closed-form in (doc_id, pixel index), so decoded statistics have an
    * exact SQL oracle (see [[syntheticRgb]]). Output
    * (doc_id, payload BINARY). */
  def syntheticImages(docs: DataFrame, w: Int, h: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => (id, PpmCodec.encode(w, h, syntheticRgb(id, w * h))))
    }.toDF("doc_id", "payload")
  }

  /** Synthetic images with PLANTED NEAR-DUPLICATES: consecutive doc
    * pairs (2k, 2k+1) share a base image, and the odd member is
    * perturbed by saturating pixel 0 to pure white — a realistic "same
    * image, tiny edit" near-dup whose aHash lands within a few bits of
    * its partner (the edited pixel's bit plus whatever borderline pixels
    * the shifted mean flips). Unlike [[syntheticRgb]]'s per-base OFFSET
    * ramp — which aHash collapses (the threshold pattern of a shifted
    * ramp is base-independent, so every doc near-dups every doc) — each
    * channel here is a base-dependent SLOPE times the pixel index, so
    * distinct bases wrap mod 256 at different rates and their hashes
    * decorrelate; the `base // 256` term keeps slopes distinct past 256
    * bases. Closed-form in (doc_id, p), so the d12 gate replays the
    * exact bit pattern in SQL. */
  def syntheticNearDupImages(docs: DataFrame, w: Int, h: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val b = id / 2
        val n = w * h
        val rgb = new Array[Byte](n * 3)
        var p = 0
        while (p < n) {
          rgb(p * 3) = (((b * 31 + (b / 256) * 97 + 7) * (p + 13)) % 256).toByte
          rgb(p * 3 + 1) = (((b * 17 + (b / 256) * 57 + 5) * (p + 29)) % 256).toByte
          rgb(p * 3 + 2) = (((b * 13 + (b / 256) * 41 + 11) * (p + 37)) % 256).toByte
          p += 1
        }
        if (id % 2 == 1) { rgb(0) = -1; rgb(1) = -1; rgb(2) = -1 } // 0xff x3
        (id, PpmCodec.encode(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
  }

  /** [[syntheticImages]] with a PNG container (JDK ImageIO encoder):
    * the same closed-form pixels behind real compressed-format bytes —
    * PNG is lossless, so the decode pipeline shares the P6 oracles
    * bit-for-bit while exercising the [[ImageIoCodec]] path. */
  def syntheticPngImages(docs: DataFrame, w: Int, h: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => (id, ImageIoCodec.encodePng(w, h, syntheticRgb(id, w * h))))
    }.toDF("doc_id", "payload")
  }

  case class AudioStats(
      doc_id: Long, sample_rate: Int, n_samples: Int,
      mean_amp: Double, rms: Double, peak: Int)

  /** Closed-form synthetic PCM16 buffer shared by the WAV generators:
    * sample j = (id*37 + j*101) % 2048 − 1024 — non-negative dividend so
    * `%` agrees between JVM and SQL, bounded well inside int16. */
  private def syntheticSamples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(j => (((id * 37 + j * 101L) % 2048) - 1024).toShort)

  /** Deterministic synthetic WAV payload per row (PCM16 mono) — the
    * audio analog of [[syntheticImages]]: decoded statistics have an
    * exact SQL oracle. Output (doc_id, payload BINARY). */
  def syntheticWavs(docs: DataFrame, nSamples: Int, sampleRate: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => (id, WavCodec.encode(sampleRate, syntheticSamples(id, nSamples))))
    }.toDF("doc_id", "payload")
  }

  /** REAL audio decode + waveform features over WAV payloads: container
    * parse ([[WavCodec]]) then mean amplitude / RMS / peak. Mean and peak
    * are integer-exact; RMS is one correctly-rounded IEEE sqrt over an
    * exactly-representable ratio, so all three replay bit-identically in
    * any engine. Map-only — scales like the image path. */
  def audioStats(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, xs) = WavCodec.decode(bytes)
        val n = xs.length
        var sum = 0L; var sq = 0L; var peak = 0
        var j = 0
        while (j < n) {
          val v = xs(j).toInt
          sum += v; sq += v.toLong * v
          val a = math.abs(v)
          if (a > peak) peak = a
          j += 1
        }
        AudioStats(id, rate, n, sum.toDouble / n,
          math.sqrt(sq.toDouble / n), peak)
      }).toDF()
  }

  /** Closed-form synthetic "speech" PCM16 buffer: windows of `winSize`
    * samples are gated quiet (|x| <= 32) when `(window + id) % 3 == 0`
    * and loud (roughly uniform in [-1024, 1023]) otherwise — the
    * silent/active alternation a voice-activity detector segments. The
    * non-alternating (mod 3, id-shifted) gate makes adjacent ACTIVE
    * windows coalesce into one segment, so the run-length logic is
    * actually exercised. Both branches keep non-negative `%` dividends,
    * so the formula replays exactly in SQL. */
  private def syntheticSpeechSamples(id: Long, n: Int, winSize: Int): Array[Short] =
    Array.tabulate(n) { j =>
      if ((j / winSize + id) % 3 == 0) (((id * 7 + j * 13L) % 64) - 32).toShort
      else (((id * 37 + j * 101L) % 2048) - 1024).toShort
    }

  /** Deterministic synthetic WAV with silence-gated windows (see
    * [[syntheticSpeechSamples]]) — the fixture behind the audio
    * segmentation gate. Output (doc_id, payload BINARY). */
  def syntheticSpeechWavs(docs: DataFrame, nSamples: Int, sampleRate: Int,
      winSize: Int, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => (id, WavCodec.encode(sampleRate,
        syntheticSpeechSamples(id, nSamples, winSize))))
    }.toDF("doc_id", "payload")
  }

  case class ResampledSample(
      doc_id: Long, out_idx: Int, n_out: Int, value: Double)

  /** Linear-interpolation sample-rate conversion over REAL WAV payloads —
    * the audio preprocessing step every speech pipeline runs before
    * feature extraction (16 kHz model in, arbitrary source rates out in
    * the wild). Output sample j sits at source position j*in/out; with
    * the rate ratio reduced to num/den, position = (i, r) where
    * i = j*num/den and r = (j*num)%den, and the interpolated value is
    * ((den-r)*x[i] + r*x[i+1]) / den — an exact integer numerator over a
    * small constant denominator, so ONE IEEE division per sample and the
    * closed-form SQL oracle replays it bit-for-bit. n_out is chosen so
    * the last position lands inside the clip (no edge clamp to disagree
    * on). Decode + resample run in one map-side pass, zero shuffle —
    * the same scale shape as every decode operator here. */
  def audioResample(withPayload: DataFrame, outRate: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(outRate > 0, s"outRate must be positive, got $outRate")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (inRate, xs) = WavCodec.decode(bytes)
        val g = BigInt(inRate).gcd(BigInt(outRate)).toInt
        val num = inRate / g
        val den = outRate / g
        // a zero-length clip has no position to interpolate at — emit no
        // rows (without the guard, (-1)*den/num+1 is 1 when den<num and
        // xs(0) throws; 0 when den>=num — inconsistent edge behavior)
        if (xs.isEmpty) Seq.empty[ResampledSample] else {
        val nOut = ((xs.length - 1).toLong * den / num).toInt + 1
        (0 until nOut).map { j =>
          val p = j.toLong * num
          val i = (p / den).toInt
          val r = (p % den).toInt
          val v =
            if (r == 0) xs(i).toDouble
            else ((den - r).toLong * xs(i) + r.toLong * xs(i + 1)).toDouble / den
          ResampledSample(id, j + 1, nOut, v)
        }
        }
      }).toDF()
  }

  case class AudioSegment(
      doc_id: Long, win_idx: Int, n_wins: Int, win_rms: Double,
      is_silence: Boolean, segment_id: Int)

  /** Windowed-energy voice-activity segmentation over REAL WAV payloads —
    * the audio keyframe primitive (the analog of [[gifFrameDiffs]] for
    * the audio modality): decode, fold each `winSize`-sample window to
    * its RMS energy, flag windows under `silenceRms` as silence, and
    * run-length-number the silence/active alternation into `segment_id`
    * (1-based, increments at every state flip). Every window of a clip
    * lives inside its own row's payload, so the whole computation —
    * decode, window fold, AND the segment run-length scan — happens in
    * ONE map-side pass with zero shuffle; at corpus scale the segment
    * table feeds silence-trimming / active-region sampling without any
    * wide operator. RMS is one correctly-rounded sqrt of an exact
    * integer ratio, so a closed-form SQL oracle replays every value. */
  def audioSegments(withPayload: DataFrame, winSize: Int, silenceRms: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(winSize > 0, s"winSize must be positive, got $winSize")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (_, xs) = WavCodec.decode(bytes)
        require(xs.length % winSize == 0,
          s"clip length ${xs.length} not a multiple of winSize $winSize")
        val nWins = xs.length / winSize
        var seg = 0
        var prevSilent = false
        (0 until nWins).map { wi =>
          var sq = 0L
          var j = wi * winSize
          val end = j + winSize
          while (j < end) { val v = xs(j).toInt; sq += v.toLong * v; j += 1 }
          val rms = math.sqrt(sq.toDouble / winSize)
          val silent = rms < silenceRms
          if (wi == 0 || silent != prevSilent) seg += 1
          prevSilent = silent
          AudioSegment(id, wi + 1, nWins, rms, silent, seg)
        }
      }).toDF()
  }

  case class AudioFrame(
      doc_id: Long, win_idx: Int, n_wins: Int, energy: Long,
      zero_crossings: Int, peak: Int)

  /** Frame-level waveform features over REAL WAV payloads — the framing
    * stage every speech feature extractor (MFCC / filterbank) runs
    * first: per `winSize`-sample window, total energy (sum of squares),
    * zero-crossing count (sign flips between ADJACENT samples inside
    * the window; 0 counts as non-negative), and peak |x|. All three are
    * exact integers, so the SQL oracle is hash-exact with no float
    * argument anywhere. Decode + framing run in one map-side pass, zero
    * shuffle — the scale shape of every decode operator here. */
  def audioFrameFeatures(withPayload: DataFrame, winSize: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(winSize > 0, s"winSize must be positive, got $winSize")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (_, xs) = WavCodec.decode(bytes)
        require(xs.length % winSize == 0,
          s"clip length ${xs.length} not a multiple of winSize $winSize")
        val nWins = xs.length / winSize
        (0 until nWins).map { wi =>
          var sq = 0L; var zc = 0; var peak = 0
          var j = wi * winSize
          val end = j + winSize
          while (j < end) {
            val v = xs(j).toInt
            sq += v.toLong * v
            val a = math.abs(v)
            if (a > peak) peak = a
            if (j > wi * winSize && (xs(j) < 0) != (xs(j - 1) < 0)) zc += 1
            j += 1
          }
          AudioFrame(id, wi + 1, nWins, sq, zc, peak)
        }
      }).toDF()
  }

  /** Closed-form synthetic gray frame shared by the GIF generators:
    * frame f, pixel p -> gray (id*29 + f*53 + p*7) % 256 — every frame of
    * every doc is distinct, and the decoded per-frame mean has an exact
    * SQL oracle. */
  private def syntheticGray(id: Long, f: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(p => ((id * 29 + f * 53L + p * 7L) % 256).toByte)

  /** Deterministic synthetic animated-GIF payload per row (nFrames gray
    * frames on the explicit 256-gray palette, so the index-mode LZW
    * round-trip is bit-exact) — the VIDEO analog of [[syntheticImages]].
    * Output (doc_id, payload BINARY). */
  def syntheticGifs(docs: DataFrame, w: Int, h: Int, nFrames: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        (id, GifCodec.encodeFrames(w, h,
          (0 until nFrames).map(f => syntheticGray(id, f, w * h))))
      }
    }.toDF("doc_id", "payload")
  }

  case class GifFrameStats(
      doc_id: Long, frame_idx: Int, n_frames: Int, width: Int, height: Int,
      mean_gray: Double)

  /** REAL multi-frame (video-shape) decode + per-frame features over GIF
    * payloads: one container parse fans out to one row per frame — the
    * frame-sampling shape with a real codec instead of [[sampleFrames]]'
    * digest stub. Asserts the decoded frames are genuinely gray (R=G=B
    * per pixel), so a palette slip cannot hide inside a channel average.
    * Map-side explode only — output rows = frames, no shuffle. */
  def gifFrameStats(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (w, h, frames) = GifCodec.decodeFrames(bytes)
        val n = w * h
        frames.zipWithIndex.map { case (rgb, f) =>
          var sum = 0L
          var p = 0
          while (p < n) {
            val r = rgb(p * 3) & 0xff
            require(rgb(p * 3 + 1) == rgb(p * 3) && rgb(p * 3 + 2) == rgb(p * 3),
              s"non-gray pixel $p in frame $f of doc $id — palette slip")
            sum += r
            p += 1
          }
          GifFrameStats(id, f + 1, frames.length, w, h, sum.toDouble / n)
        }
      }).toDF()
  }

  case class GifFrameDiff(
      doc_id: Long, pair_idx: Int, n_frames: Int, mean_abs_diff: Double)

  /** Temporal frame differencing (the scene-change / keyframe-selection
    * primitive of a video pipeline): mean absolute gray-level difference
    * between each consecutive frame pair of a decoded multi-frame
    * payload. One container parse per row, map-side flatMap — rows out =
    * frame pairs, no shuffle; at corpus scale the diff feeds a threshold
    * filter that picks keyframes before any expensive per-frame work. */
  def gifFrameDiffs(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (w, h, frames) = GifCodec.decodeFrames(bytes)
        // mean |delta| over ALL channel samples (3 per pixel) — on a
        // grayscale palette (r==g==b, the gated synthetic case) this is
        // identical to the single-channel mean, and on color GIFs it is
        // the documented mean-absolute-difference rather than a silent
        // red-channel-only read
        val samples = w * h * 3
        (1 until frames.length).map { f =>
          val prev = frames(f - 1)
          val cur = frames(f)
          var sum = 0L
          var p = 0
          while (p < samples) {
            sum += math.abs((cur(p) & 0xff) - (prev(p) & 0xff))
            p += 1
          }
          GifFrameDiff(id, f, frames.length, sum.toDouble / samples)
        }
      }).toDF()
  }

  private def statsOf(id: Long, w: Int, h: Int, rgb: Array[Byte]): ImageStats = {
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < n) {
      sr += rgb(p * 3) & 0xff
      sg += rgb(p * 3 + 1) & 0xff
      sb += rgb(p * 3 + 2) & 0xff
      p += 1
    }
    ImageStats(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** REAL image decode + per-channel mean features over P6 payloads —
    * decoder instantiated per task, batch streamed through it. */
  /** Average-hash (aHash) perceptual fingerprint over REAL decoded bytes —
    * the classic image near-dup primitive: per-pixel integer grayscale
    * (r+g+b)/3, one bit per pixel set iff the pixel is STRICTLY brighter
    * than the image mean, packed little-endian into a LONG (requires
    * w*h <= 63). The mean test is exact rational arithmetic
    * (gray*n > sum), so the hash is bit-reproducible across engines —
    * which is what lets a closed-form SQL oracle replay it. Map-only:
    * scales as a pure per-row codec job. */
  def imagePHash(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, rgb) = decodeAny(bytes)
        val n = w * h
        require(n <= 63, s"aHash packs into a LONG: w*h must be <= 63, got $n")
        val gray = new Array[Int](n)
        var sum = 0L
        var i = 0
        while (i < n) {
          gray(i) = ((rgb(3 * i) & 0xff) + (rgb(3 * i + 1) & 0xff) +
            (rgb(3 * i + 2) & 0xff)) / 3
          sum += gray(i)
          i += 1
        }
        var hash = 0L
        i = 0
        while (i < n) {
          if (gray(i).toLong * n > sum) hash |= 1L << i
          i += 1
        }
        (id, n, hash)
      }).toDF("doc_id", "n_px", "phash")
  }

  def imageStats(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, rgb) = decodeAny(bytes)
        statsOf(id, w, h, rgb)
      }).toDF()
  }

  /** Decode → nearest-neighbor resize → features of the RESIZED image
    * (the thumbnailing shape: decode and scale inside one task pass). */
  def resizeImage(withPayload: DataFrame, outW: Int, outH: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, rgb) = decodeAny(bytes)
        statsOf(id, outW, outH, PpmCodec.resizeNearest(w, h, rgb, outW, outH))
      }).toDF()
  }

}
