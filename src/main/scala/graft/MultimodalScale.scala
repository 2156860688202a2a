package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.ext.Multimodal.MediaItem

/** Corpus-scale multimodal run record — the tenth scale harness (dev
  * tool, run manually; results recorded in README), closing the one
  * heavy family that was only exercised at 500 rows (q29).
  *
  * Synthesizes `n` (default 140k) media payloads ON THE EXECUTORS —
  * real encoded bytes, not metadata stubs — with format by `id % 7`:
  * hand-built 24-bpp BMP, binary P5 PGM, ImageIO-encoded PNG / GIF /
  * JPEG, RIFF/WAVE PCM, and corrupt payloads (truncated BMP magic /
  * non-digit PGM header — the catch-to-stub seam). Geometry is PLANTED
  * in id arithmetic: every image is (8+id%24) × (8+id%16) filled with
  * the uniform gray v = id%256, every WAV has rate 8000+10·(id%100),
  * 1+id%2 channels, 100+id%50 frames — so decode output is asserted
  * against CLOSED-FORM truth per row, not sampled:
  *
  *  - decode → features: width/height exact for every decodable image;
  *    mean intensity EXACTLY v for the lossless formats (BMP, PGM, PNG,
  *    GIF), within ±3 gray levels for JPEG (lossy by nature);
  *    `decoded = true` on all of them;
  *  - corrupt rows: `decoded = false` on EVERY one (the honesty flag —
  *    no stub geometry can masquerade as a real parse), and the task
  *    never fails (a corrupt item costs one fallback row, not a stage
  *    retry);
  *  - audio: sample_rate / channels / n_frames / duration match the
  *    planted arithmetic exactly, `decoded = true`;
  *  - resize → decode composes: every decodable image thumbnails to
  *    16×16 P5 whose re-decode reports 16×16, and (lossless formats)
  *    mean still exactly v — nearest-neighbor over a uniform raster is
  *    the identity on values.
  *
  * Scale shape: generation, decode, resize, and feature extraction are
  * all partition-parallel `mapPartitions` with per-item bounded memory —
  * no collect, no driver loop; the only driver rows are the ≤ a-dozen
  * assertion aggregates. Prints one JSON line with volumes, timings,
  * and payload throughput.
  */
object MultimodalScale {
  // ───── deterministic payload builders (executor-side) ─────

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Uncompressed 24-bpp BI_RGB BMP, every channel byte = v. */
  def bmpBytes(w: Int, h: Int, v: Int): Array[Byte] = {
    val rowSize = ((24 * w + 31) / 32) * 4
    val imgSize = rowSize * h
    val out = new java.io.ByteArrayOutputStream(54 + imgSize)
    out.write('B'); out.write('M')
    out.write(le32(54 + imgSize)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(imgSize)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val row = new Array[Byte](rowSize) // padding bytes stay 0
    java.util.Arrays.fill(row, 0, 3 * w, v.toByte)
    (0 until h).foreach(_ => out.write(row))
    out.toByteArray
  }

  /** Binary P5 PGM, every sample = v. */
  def pgmBytes(w: Int, h: Int, v: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    java.util.Arrays.fill(out, header.length, out.length, v.toByte)
    out
  }

  /** PNG/GIF/JPEG via the JDK's own writers, uniform gray v. */
  def imageIoBytes(fmt: String, w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** RIFF/WAVE with a PCM fmt chunk and a zeroed data chunk. */
  def wavBytes(rate: Int, channels: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = frames * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36 + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(rate))
    out.write(le32(rate * blockAlign)); out.write(le16(blockAlign))
    out.write(le16(16))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataSize))
    out.write(new Array[Byte](dataSize))
    out.toByteArray
  }

  /** Corrupt payloads: a BMP magic too short to parse, or a P5 header
    * with non-digit dims — both must route through the catch-to-stub
    * seam, never fail the task.
    */
  def corruptBytes(id: Long): Array[Byte] =
    if (id % 2 == 0) Array[Byte]('B', 'M', 1, 2, 3, 4, 5, 6)
    else s"P5\n${id}x junk\n255\n".getBytes("US-ASCII")

  def plantedW(id: Long): Int = 8 + (id % 24).toInt
  def plantedH(id: Long): Int = 8 + (id % 16).toInt
  def plantedV(id: Long): Int = (id % 256).toInt
  def plantedRate(id: Long): Int = 8000 + 10 * (id % 100).toInt
  def plantedChannels(id: Long): Int = 1 + (id % 2).toInt
  def plantedFrames(id: Long): Int = 100 + (id % 50).toInt

  /** One payload per id; kind index = id % 7. */
  def payload(id: Long): MediaItem = {
    val (w, h, v) = (plantedW(id), plantedH(id), plantedV(id))
    (id % 7) match {
      case 0 => MediaItem(id, bmpBytes(w, h, v), "image")
      case 1 => MediaItem(id, pgmBytes(w, h, v), "image")
      case 2 => MediaItem(id, imageIoBytes("png", w, h, v), "image")
      case 3 => MediaItem(id, imageIoBytes("gif", w, h, v), "image")
      case 4 => MediaItem(id, imageIoBytes("jpg", w, h, v), "image")
      case 5 => MediaItem(id, wavBytes(plantedRate(id),
        plantedChannels(id), plantedFrames(id)), "audio")
      case _ => MediaItem(id, corruptBytes(id), "video")
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(140000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    // generation is itself partition-parallel: real encoders run on
    // executors, the driver never sees a payload
    val tGen = t0()
    val media = spark.range(n).as[Long]
      .mapPartitions(_.map(payload)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBytes = media.agg(sum(length(col("media")))).head().getLong(0)
    val genSec = secs(tGen)

    // ── decode → features over ALL payloads (corrupt ones included) ──
    val tFeat = t0()
    val feats = Multimodal.extractFeatures(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFeat = feats.count()
    val featSec = secs(tFeat)
    assert(nFeat == n, s"feature rows $nFeat != $n — a payload failed")

    val kind = pmod(col("doc_id"), lit(7L))
    val w = (lit(8) + pmod(col("doc_id"), lit(24L))).cast("int")
    val h = (lit(8) + pmod(col("doc_id"), lit(16L))).cast("int")
    val v = pmod(col("doc_id"), lit(256L)).cast("double")

    // lossless images: exact geometry AND exact mean, all decoded
    val badLossless = feats.filter(kind.isin(0, 1, 2, 3))
      .filter(!col("decoded") || col("width") =!= w ||
        col("height") =!= h || col("mean_intensity") =!= v)
      .count()
    assert(badLossless == 0,
      s"$badLossless lossless rows off the planted geometry/mean")
    // JPEG: exact dims, mean within ±3 gray levels of the plant
    val badJpeg = feats.filter(kind === 4)
      .filter(!col("decoded") || col("width") =!= w ||
        col("height") =!= h ||
        abs(col("mean_intensity") - v) > 3.0)
      .count()
    assert(badJpeg == 0, s"$badJpeg jpeg rows off the planted truth")
    // corrupt payloads: decoded=false on EVERY row
    val corruptDecoded = feats.filter(kind === 6)
      .filter(col("decoded")).count()
    assert(corruptDecoded == 0,
      s"$corruptDecoded corrupt payloads claimed a real decode")

    // ── audio metadata over the WAV rows ──
    val tAud = t0()
    val aud = Multimodal.audioFeatures(media.filter(kind === 5))
    val rate = (lit(8000) + lit(10) * pmod(col("doc_id"), lit(100L)))
      .cast("int")
    val chans = (lit(1) + pmod(col("doc_id"), lit(2L))).cast("int")
    val frames = (lit(100) + pmod(col("doc_id"), lit(50L))).cast("long")
    val badAudio = aud.filter(!col("decoded") ||
      col("sample_rate") =!= rate || col("channels") =!= chans ||
      col("n_frames") =!= frames).count()
    val audSec = secs(tAud)
    assert(badAudio == 0, s"$badAudio wav rows off the planted params")

    // ── resize → re-decode composes on every decodable image ──
    val tRes = t0()
    val thumbs = Multimodal.resizeMedia(
      media.filter(kind.isin(0, 1, 2, 3, 4)), 16, 16)
    val re = Multimodal.extractFeatures(thumbs)
    val badThumb = re.filter(!col("decoded") ||
      col("width") =!= 16 || col("height") =!= 16).count()
    // nearest-neighbor over a UNIFORM raster is value-exact: lossless
    // sources must re-decode to mean exactly v
    val badThumbMean = re.filter(pmod(col("doc_id"), lit(7L)).isin(0, 1, 2, 3))
      .filter(col("mean_intensity") =!= v).count()
    val resSec = secs(tRes)
    assert(badThumb == 0, s"$badThumb thumbnails off 16x16/decoded")
    assert(badThumbMean == 0,
      s"$badThumbMean lossless thumbnails changed the uniform mean")

    // ── dHash over gradient pairs: BMP original + its 16×16 PGM
    // re-encode (round 14, q147's scale record). A strict horizontal
    // gradient makes the planted truth closed-form: every sampled
    // left < right comparison is true, so dhash == -1 (all 64 bits) for
    // BOTH the original and the thumbnail — re-encode Hamming 0 for
    // every pair, asserted over all rows, partition-parallel end to end.
    val tDh = t0()
    val grads = spark.range(n / 7).as[Long].mapPartitions(_.flatMap { id =>
      val gw = 16 + (id % 16).toInt
      val gh = 12 + (id % 8).toInt
      val img = new java.awt.image.BufferedImage(gw, gh,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      (0 until gw).foreach { x =>
        val gv = x * 255 / (gw - 1)
        g.setColor(new java.awt.Color(gv, gv, gv))
        g.fillRect(x, 0, 1, gh)
      }
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      val bmp = bos.toByteArray
      Iterator(MediaItem(id * 2, bmp, "image"),
        MediaItem(id * 2 + 1, Multimodal.resizeToPgm(bmp, 16, 16),
          "image"))
    }).toDF()
    val badDh = Multimodal.dhashMedia(grads)
      .filter(col("dhash") =!= lit(-1L)).count()
    val dhSec = secs(tDh)
    assert(badDh == 0, s"$badDh gradient dhashes off the planted all-ones")

    println(s"""{"n":$n,"payload_bytes":$nBytes,"gen_sec":$genSec,""" +
      s""""feat_sec":$featSec,""" +
      s""""payloads_per_sec":${(n / featSec).toLong},""" +
      s""""audio_sec":$audSec,"resize_sec":$resSec,"dhash_sec":$dhSec,""" +
      s""""bad_lossless":$badLossless,"bad_jpeg":$badJpeg,""" +
      s""""corrupt_decoded":$corruptDecoded,"bad_audio":$badAudio,""" +
      s""""bad_thumb":$badThumb,"bad_thumb_mean":$badThumbMean,""" +
      s""""bad_dhash":$badDh}""")
    spark.stop()
  }
}
