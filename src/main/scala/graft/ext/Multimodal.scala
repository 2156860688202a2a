package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) as opaque BINARY columns with typed metadata,
  * processed batch-at-a-time inside `mapPartitions`.
  *
  * The decode seam ([[decode]]) sniffs the payload: uncompressed BMP and
  * binary PGM decode through hand parsers (zero-allocation fast path);
  * PNG/JPEG/GIF decode through the JDK's own headless `javax.imageio`
  * readers — so every mainstream image format yields REAL header dims
  * and true mean pixel intensity. WAV audio parses through [[decodeWav]]
  * (RIFF chunks → sample rate / channels / duration). Only payloads in
  * none of those formats fall through to the deterministic
  * [[decodeStub]] — a loud stand-in for codecs the JVM genuinely lacks
  * (video containers, compressed audio). Everything around the seam is
  * the real engineering: schema (binary + metadata struct),
  * partition-parallel batched processing, bounded memory per item, and a
  * typed output schema with a `decoded` honesty flag separating real
  * parses from stub fallbacks.
  */
object Multimodal {

  // executor-global: decode in memory, never through ImageIO's on-disk
  // temp-file cache (one settled JVM flag, not per-call)
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaItem(doc_id: Long, media: Array[Byte],
                             media_type: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                                 height: Int, mean_intensity: Double,
                                 frames_sampled: Int, decoded: Boolean)

  /** documents → opaque media column. Real pipelines read binary from
    * parquet/lance; here the bytes are the utf-8 text (an opaque payload
    * as far as the pipeline is concerned).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"))

  /** STUB decode — stands in for an image/audio decoder that is not in
    * this container. Deterministic: derives fake dimensions from the byte
    * length and a fake intensity from the byte values, so tests are
    * stable. A real implementation would decode `bytes` here (one item at
    * a time, inside the partition loop — never collect).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    val height = math.max(1, n / math.max(1, width))
    var s = 0L
    var i = 0
    while (i < n) { s += bytes(i) & 0xff; i += 1 }
    (width, height, if (n == 0) 0.0 else s.toDouble / n)
  }

  /** The decode seam: real parse for every sniffable image format,
    * deterministic stub for everything else. A malformed header in a
    * sniffed format falls back to the stub rather than failing the task —
    * at pipeline scale a corrupt item must cost one fallback row, not a
    * stage retry. The boolean is the honesty flag: true iff the numbers
    * came from a real parse.
    */
  def decodeEx(bytes: Array[Byte]): (Int, Int, Double, Boolean) =
    try {
      if (isBmp(bytes)) withFlag(decodeBmp(bytes))
      else if (isPgm(bytes)) withFlag(decodePgm(bytes))
      else if (isCodecImage(bytes)) withFlag(decodeImageIo(bytes))
      else stubFlag(bytes)
    } catch { case _: Exception => stubFlag(bytes) }

  def decode(bytes: Array[Byte]): (Int, Int, Double) = {
    val (w, h, m, _) = decodeEx(bytes)
    (w, h, m)
  }

  private def withFlag(t: (Int, Int, Double)) = (t._1, t._2, t._3, true)
  private def stubFlag(b: Array[Byte]) = {
    val (w, h, m) = decodeStub(b)
    (w, h, m, false)
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte
  private def isPgm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P'.toByte && b(1) == '5'.toByte
  // codec image formats the JDK's built-in ImageIO readers handle
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
      b(2) == 'N'.toByte && b(3) == 'G'.toByte
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff
  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte
  private def isCodecImage(b: Array[Byte]): Boolean =
    isPng(b) || isJpeg(b) || isGif(b)

  /** PNG/JPEG/GIF through the JDK's headless ImageIO readers (the same
    * library `sinks/Plots` already uses to WRITE PNGs — no external
    * dependency). One bulk ARGB grab per item: memory bounded at 4·w·h
    * per in-flight item, inside the partition loop.
    */
  private def decodeImageIo(b: Array[Byte]): (Int, Int, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "no ImageIO reader accepted the payload")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      i += 1
    }
    (w, h, sum.toDouble / (w.toLong * h * 3))
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Parsed BITMAPINFOHEADER of an uncompressed (BI_RGB) 24/32-bpp BMP.
    * `bottomUp` records the row order (positive height per the spec):
    * irrelevant to a mean, orientation-critical to a resize.
    */
  private final case class BmpHeader(off: Int, w: Int, h: Int,
                                     stride: Int, rowSize: Int,
                                     bottomUp: Boolean) {
    /** byte offset of image row `y` (y = 0 is the TOP image row) */
    def rowOff(y: Int): Int =
      off + (if (bottomUp) h - 1 - y else y) * rowSize
  }

  private def parseBmpHeader(b: Array[Byte]): BmpHeader = {
    val off = le32(b, 10)
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    val h = math.abs(rawH)
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    require(w > 0 && h > 0 && comp == 0 && (bpp == 24 || bpp == 32),
      s"unsupported BMP: ${w}x$h bpp=$bpp comp=$comp")
    val rowSize = ((bpp * w + 31) / 32) * 4
    require(off + rowSize.toLong * h <= b.length, "truncated BMP")
    BmpHeader(off, w, h, bpp / 8, rowSize, bottomUp = rawH > 0)
  }

  /** Uncompressed (BI_RGB) 24/32-bpp BMP: dims from the BITMAPINFOHEADER,
    * mean over the R/G/B channel bytes of every pixel (alpha excluded),
    * honoring 4-byte row padding (row order is irrelevant to a mean).
    */
  private def decodeBmp(b: Array[Byte]): (Int, Int, Double) = {
    val hd = parseBmpHeader(b)
    var sum = 0L
    var row = 0
    while (row < hd.h) {
      var x = 0
      while (x < hd.w) {
        val p = hd.rowOff(row) + x * hd.stride
        sum += (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
        x += 1
      }
      row += 1
    }
    (hd.w, hd.h, sum.toDouble / (hd.w.toLong * hd.h * 3))
  }

  /** Parsed P5 header: dims + offset of the first sample byte. */
  private final case class PgmHeader(w: Int, h: Int, dataOff: Int)

  private def parsePgmHeader(b: Array[Byte]): PgmHeader = {
    var i = 2 // past "P5"
    def nextToken(): Int = {
      while (i < b.length &&
        (Character.isWhitespace(b(i)) || b(i) == '#'.toByte)) {
        if (b(i) == '#'.toByte)
          while (i < b.length && b(i) != '\n'.toByte) i += 1
        else i += 1
      }
      var v = 0
      while (i < b.length && !Character.isWhitespace(b(i))) {
        // strictly digits: a 'P5'-prefixed text payload must FAIL the
        // parse (→ stub fallback), not parse garbage as dimensions
        require(b(i) >= '0'.toByte && b(i) <= '9'.toByte,
          s"non-digit in PGM header: ${b(i)}")
        v = v * 10 + (b(i) - '0'.toByte); i += 1
      }
      v
    }
    val w = nextToken(); val h = nextToken(); val maxVal = nextToken()
    i += 1 // the single whitespace byte after maxval
    require(w > 0 && h > 0 && maxVal > 0 && maxVal <= 255,
      s"unsupported PGM: ${w}x$h maxval=$maxVal")
    require(i + w.toLong * h <= b.length, "truncated PGM")
    PgmHeader(w, h, i)
  }

  /** Binary PGM (P5): ASCII header tokens (magic, width, height, maxval;
    * `#` comments allowed) then one whitespace byte and w×h raw samples
    * (maxval ≤ 255 ⇒ 1 byte each); mean over the samples.
    */
  private def decodePgm(b: Array[Byte]): (Int, Int, Double) = {
    val hd = parsePgmHeader(b)
    var sum = 0L
    var p = 0
    val n = hd.w * hd.h
    while (p < n) { sum += b(hd.dataOff + p) & 0xff; p += 1 }
    (hd.w, hd.h, sum.toDouble / n)
  }

  /** Grayscale pixel accessor behind the same seam as [[decode]]:
    * (width, height, (x, y) → 0-255) with y = 0 the TOP image row. BMP
    * pixels are channel-averaged and the accessor honors the file's
    * bottom-up vs top-down row order (a mean is order-invariant, a
    * resize is not — [[BmpHeader.rowOff]] carries the orientation); PGM
    * reads samples directly; anything else gets the deterministic stub
    * raster (byte stream wrapped to the stub's fake dimensions). Header
    * parsing is shared with [[decodeBmp]]/[[decodePgm]], so resize
    * accepts exactly the payloads decode accepts.
    */
  private def grayRaster(b: Array[Byte]): (Int, Int, (Int, Int) => Int) =
    try {
      if (isBmp(b)) {
        val hd = parseBmpHeader(b)
        (hd.w, hd.h, (x, y) => {
          val p = hd.rowOff(y) + x * hd.stride
          ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3
        })
      } else if (isPgm(b)) {
        val hd = parsePgmHeader(b)
        (hd.w, hd.h, (x, y) => b(hd.dataOff + y * hd.w + x) & 0xff)
      } else if (isCodecImage(b)) {
        // ImageIO's BufferedImage is already top-down; channel-average
        // like the BMP path so resize semantics match across formats
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        require(img != null, "no ImageIO reader accepted the payload")
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        (w, h, (x, y) => {
          val p = px(y * w + x)
          (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        })
      } else stubRaster(b)
    } catch { case _: Exception => stubRaster(b) }

  private def stubRaster(b: Array[Byte]): (Int, Int, (Int, Int) => Int) = {
    val (w, h, _) = decodeStub(b)
    val n = math.max(1, b.length)
    (w, h, (x, y) => if (b.isEmpty) 0 else b((y * w + x) % n) & 0xff)
  }

  /** Nearest-neighbor resize to (tw × th), emitted as a binary P5 PGM
    * payload — a REAL raster transform for the decodable formats
    * (channel-averaged for BMP), the deterministic stub raster for codec
    * formats, same seam as [[decode]]. Output is itself decodable by
    * [[decode]]/[[grayRaster]], so resize → decode → features composes;
    * runs per item inside the partition loop, bounded memory tw×th.
    */
  def resizeToPgm(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    require(tw > 0 && th > 0, s"bad target dims ${tw}x$th")
    val (w, h, px) = grayRaster(bytes)
    val header = s"P5\n$tw $th\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + tw * th)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = header.length
    var ty = 0
    while (ty < th) {
      val sy = (ty.toLong * h / th).toInt
      var tx = 0
      while (tx < tw) {
        out(k) = px((tx.toLong * w / tw).toInt, sy).toByte
        k += 1; tx += 1
      }
      ty += 1
    }
    out
  }

  /** Resize over a media DataFrame: partition-parallel map, each item's
    * payload replaced by its (tw × th) P5 thumbnail.
    */
  def resizeMedia(media: DataFrame, tw: Int = 16, th: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map(item => MediaItem(item.doc_id,
        resizeToPgm(item.media, tw, th), item.media_type))
    }.toDF()
  }

  /** 64-bit dHash (difference hash) of the payload's grayscale raster —
    * the image-modality near-dup signature the text stack (q24/q90)
    * cannot see: nearest-neighbor sample to a 9×8 grid through the same
    * seam as [[resizeToPgm]] (real raster for BMP/PGM/codec images, the
    * deterministic stub raster otherwise), bit y·8+x set iff
    * px(x, y) < px(x+1, y) on the sampled row. Re-encodes of the same
    * image (format change, thumbnail, small noise) keep almost every
    * bit, so Manku banding + exact Hamming finds them with zero
    * all-pairs work (MultimodalSpec pins a BMP caught against its PGM
    * re-encode at distance 0).
    */
  def dHash64(bytes: Array[Byte]): Long = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    val (w, h, px) = grayRaster(b)
    var z = 0L
    var y = 0
    while (y < 8) {
      val sy = (y.toLong * h / 8).toInt
      var x = 0
      while (x < 8) {
        val l = px((x.toLong * w / 9).toInt, sy)
        val r = px(((x + 1).toLong * w / 9).toInt, sy)
        if (l < r) z |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    z
  }

  final case class MediaHash(doc_id: Long, dhash: Long)

  /** [[dHash64]] over a media DataFrame: partition-parallel map, one
    * signature row per item. Pair with [[graft.ext.Dedup.bandPairs64]]
    * for the banded near-dup join (q147).
    */
  def dhashMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions(it =>
      it.map(i => MediaHash(i.doc_id, dHash64(i.media)))).toDF()
  }

  /** Feature extraction over media items: partition-parallel, streaming
    * per item, no driver involvement. Frame sampling for "video" = every
    * 64th byte-row of the decode (stub for real frame extraction — the
    * `decoded` flag is false on those rows, so no downstream consumer
    * can mistake stub geometry for decoded media).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { item =>
        val (w, h, mean, real) = decodeEx(item.media)
        val frames = if (item.media_type == "video")
          math.max(1, h / 64) else 1
        MediaFeatures(item.doc_id, item.media.length.toLong, w, h, mean,
          frames, real)
      }
    }.toDF()
  }

  // ───── audio (WAV/RIFF) ─────

  final case class WavMeta(sample_rate: Int, channels: Int,
                           bits_per_sample: Int, n_frames: Long,
                           duration_sec: Double)
  final case class AudioFeatures(doc_id: Long, n_bytes: Long,
                                 sample_rate: Int, channels: Int,
                                 bits_per_sample: Int, n_frames: Long,
                                 duration_sec: Double, decoded: Boolean)

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == 'F'.toByte && b(8) == 'W'.toByte &&
      b(9) == 'A'.toByte && b(10) == 'V'.toByte && b(11) == 'E'.toByte

  /** Real WAV parse: walk the RIFF chunk list (ids + little-endian
    * sizes, even-byte aligned), read PCM params from `fmt ` and the
    * frame count from `data` size / block align. Throws on malformed
    * input — callers route through the same catch-to-stub discipline as
    * the image seam.
    */
  def decodeWav(b: Array[Byte]): WavMeta = {
    require(isWav(b), "not a RIFF/WAVE payload")
    var i = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var blockAlign = 0
    var dataSize = -1L
    while (i + 8 <= b.length && (sampleRate == 0 || dataSize < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4).toLong & 0xffffffffL
      val body = i + 8
      if (id == "fmt ") {
        require(size >= 16 && body + 16 <= b.length, "truncated fmt chunk")
        channels = le16(b, body + 2)
        sampleRate = le32(b, body + 4)
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
      } else if (id == "data") {
        require(body + size <= b.length, "truncated data chunk")
        dataSize = size
      }
      i = body + size.toInt + (size.toInt & 1) // chunks are even-aligned
    }
    require(sampleRate > 0 && channels > 0 && blockAlign > 0 &&
      dataSize >= 0, "missing fmt/data chunk")
    val frames = dataSize / blockAlign
    WavMeta(sampleRate, channels, bits, frames,
      frames.toDouble / sampleRate)
  }

  /** Byte span (offset, length) of the `data` chunk's PCM samples in a
    * RIFF/WAVE payload — the audio content with every container detail
    * (chunk order, metadata chunks, fmt params) stripped away.
    */
  private def pcmSpan(b: Array[Byte]): (Int, Int) = {
    require(isWav(b), "not a RIFF/WAVE payload")
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4).toLong & 0xffffffffL
      val body = i + 8
      if (id == "data") {
        require(body + size <= b.length, "truncated data chunk")
        return (body, size.toInt)
      }
      i = body + size.toInt + (size.toInt & 1)
    }
    throw new IllegalArgumentException("no data chunk")
  }

  /** Minimal 8-bit mono PCM WAV container around `pcm` (8 kHz) — the
    * synthetic-payload constructor specs and face queries use to drive
    * the REAL RIFF seam. `extraChunk` inserts a LIST metadata chunk
    * before `data`, modelling a re-encode that rewrites container
    * framing without touching the audio.
    */
  def wavOf(pcm: Array[Byte], extraChunk: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def w16(v: Int): Unit = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val junk = "INFOgraft-reencode-v2".getBytes("US-ASCII")
    val extra = if (extraChunk) 8 + junk.length + (junk.length & 1) else 0
    tag("RIFF"); w32(4 + 24 + extra + 8 + pcm.length + (pcm.length & 1))
    tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(1); w32(8000); w32(8000); w16(1); w16(8)
    if (extraChunk) {
      tag("LIST"); w32(junk.length); out.write(junk)
      if ((junk.length & 1) == 1) out.write(0)
    }
    tag("data"); w32(pcm.length); out.write(pcm)
    if ((pcm.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** 64-bit chromaprint-lite audio fingerprint: the PCM byte stream is
    * cut into 9 equal windows × 8 bands, each (window, band) cell's
    * energy is the sum of 4 deterministically-sampled unsigned bytes
    * (position `(w·n)/9 + ((b·4+j)·n)/288`), and bit w·8+b is set iff
    * energy(w, b) < energy(w+1, b) — the same delta-coding that makes
    * dHash robust: a re-encode perturbing every sample a little keeps
    * almost every INEQUALITY. For a RIFF/WAVE payload the stream is the
    * `data` chunk's PCM bytes, so the fingerprint is invariant to chunk
    * order, metadata chunks, and fmt params (MultimodalSpec pins a
    * re-encoded WAV at Hamming 0); any other payload fingerprints its
    * raw bytes — the deterministic stub seam, same discipline as
    * [[grayRaster]]. Pair with [[graft.ext.Dedup.bandPairs64]] exactly
    * like the image path (q147).
    */
  def audioFingerprint64(bytes: Array[Byte]): Long = {
    val raw = if (bytes == null) Array.emptyByteArray else bytes
    val (off, n) =
      try pcmSpan(raw)
      catch { case _: Exception => (0, raw.length) }
    if (n == 0) return 0L
    def px(p: Long): Int = raw(off + (p % n).toInt) & 0xff
    def energy(w: Int, b: Int): Long = {
      var e = 0L
      var j = 0
      while (j < 4) {
        e += px((w.toLong * n) / 9 + ((b * 4 + j).toLong * n) / 288)
        j += 1
      }
      e
    }
    var z = 0L
    var w = 0
    while (w < 8) {
      var b = 0
      while (b < 8) {
        if (energy(w, b) < energy(w + 1, b)) z |= 1L << (w * 8 + b)
        b += 1
      }
      w += 1
    }
    z
  }

  final case class MediaAfp(doc_id: Long, afp: Long)

  /** [[audioFingerprint64]] over a media DataFrame: partition-parallel
    * map, one signature row per item — the audio sibling of
    * [[dhashMedia]].
    */
  def afpMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions(it =>
      it.map(i => MediaAfp(i.doc_id, audioFingerprint64(i.media)))).toDF()
  }

  /** Audio metadata extraction over media items, same shape as
    * [[extractFeatures]]: real RIFF parse where the payload is WAV,
    * deterministic zeroed row with `decoded = false` otherwise.
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { item =>
        val n = item.media.length.toLong
        try {
          val m = decodeWav(item.media)
          AudioFeatures(item.doc_id, n, m.sample_rate, m.channels,
            m.bits_per_sample, m.n_frames, m.duration_sec, decoded = true)
        } catch {
          case _: Exception =>
            AudioFeatures(item.doc_id, n, 0, 0, 0, 0L, 0.0,
              decoded = false)
        }
      }
    }.toDF()
  }
}
