package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, real decode for BMP/PGM (hand parsers)
  * and PNG/JPEG/GIF (JDK ImageIO) and WAV (RIFF parser), deterministic
  * stub only for formats the JVM genuinely lacks, partition-parallel
  * extraction (SURVEY §7.5).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "x" * 100), (1L, "y" * 50), (2L, "z" * 300), (3L, "")
  ).toDF("doc_id", "text")

  test("asMedia produces binary payloads with typed media_type") {
    val m = Multimodal.asMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val types = m.select($"doc_id", $"media_type").as[(Long, String)]
      .collect().toMap
    assert(types(0L) == "image" && types(1L) == "audio" &&
      types(2L) == "video")
  }

  test("extractFeatures: deterministic stub dims, n_bytes exact") {
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs))
    val rows = f.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[Long]("n_bytes") == 100)
    assert(rows(0L).getAs[Int]("width") == 10)   // √100
    assert(rows(0L).getAs[Int]("height") == 10)
    assert(rows(3L).getAs[Long]("n_bytes") == 0)
    assert(rows(3L).getAs[Int]("width") == 1)    // degenerate guard
    // mean intensity of 'x'*100 is exactly 'x'.toByte
    assert(rows(0L).getAs[Double]("mean_intensity") == 'x'.toInt.toDouble)
  }

  test("decode parses a real BMP: header dims + true mean intensity") {
    // render a 4×3 image with known channel values and write REAL BMP
    // bytes with the JDK's own encoder, then decode with the pure parser
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 3)
      img.setRGB(x, y, new java.awt.Color(10 * (x + 1), 20, 30).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val bytes = bos.toByteArray
    val (w, h, mean) = Multimodal.decode(bytes)
    assert(w == 4 && h == 3)
    // mean over RGB channels: rows identical; r = 10,20,30,40 per x
    val expected = (0 until 4).map(x => 10.0 * (x + 1) + 20 + 30).sum / 12
    assert(math.abs(mean - expected) < 1e-9, s"mean=$mean exp=$expected")
  }

  test("decode parses a binary PGM and survives malformed headers") {
    val header = "P5\n# a comment\n3 2\n255\n".getBytes("US-ASCII")
    val pixels = Array[Byte](0, 50, 100, (150).toByte, (200).toByte,
      (250).toByte)
    val (w, h, mean) = Multimodal.decode(header ++ pixels)
    assert(w == 3 && h == 2)
    assert(mean == (0 + 50 + 100 + 150 + 200 + 250) / 6.0)
    // a text payload that merely STARTS like a PGM magic falls back to
    // the stub (strict parse fails), it does not crash the task
    val fake = "P5 this is prose, not pixels".getBytes("UTF-8")
    val (fw, fh, _) = Multimodal.decode(fake)
    assert((fw, fh) == (Multimodal.decodeStub(fake)._1,
      Multimodal.decodeStub(fake)._2))
  }

  test("extractFeatures routes real rasters through the real decode") {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8)
      img.setRGB(x, y, new java.awt.Color(60, 60, 60).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val media = Seq((100L, bos.toByteArray, "image"))
      .toDF("doc_id", "media", "media_type")
    val row = Multimodal.extractFeatures(media).collect().head
    assert(row.getAs[Int]("width") == 8 && row.getAs[Int]("height") == 8)
    assert(row.getAs[Double]("mean_intensity") == 60.0)
  }

  test("decode parses real PNG and JPEG through the JDK's ImageIO readers") {
    // PNG is lossless: exact dims AND exact mean must survive the codec
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 5; y <- 0 until 4)
      img.setRGB(x, y, new java.awt.Color(7 * x, 11 * y, 13).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val (w, h, mean, real) = Multimodal.decodeEx(bos.toByteArray)
    assert((w, h, real) == ((5, 4, true)))
    val exp = (for (x <- 0 until 5; y <- 0 until 4)
      yield 7 * x + 11 * y + 13).sum / (5.0 * 4 * 3)
    assert(math.abs(mean - exp) < 1e-9, s"png mean=$mean exp=$exp")
    // JPEG is lossy: dims exact, flat-color mean within codec tolerance
    val jimg = new java.awt.image.BufferedImage(6, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 6; y <- 0 until 6)
      jimg.setRGB(x, y, new java.awt.Color(120, 120, 120).getRGB)
    val jb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(jimg, "jpg", jb))
    val (jw, jh, jmean, jreal) = Multimodal.decodeEx(jb.toByteArray)
    assert((jw, jh, jreal) == ((6, 6, true)))
    assert(math.abs(jmean - 120.0) < 4.0, s"jpeg mean=$jmean")
    // a truncated PNG falls back to the stub with decoded = false
    val broken = bos.toByteArray.take(20)
    assert(!Multimodal.decodeEx(broken)._4)
  }

  test("resizeToPgm reads PNG rasters with correct orientation") {
    // 4×4 PNG: top half white, bottom half black → 1×2 thumbnail must
    // keep white on top (ImageIO rasters are top-down)
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) {
      val v = if (y < 2) 255 else 0
      img.setRGB(x, y, new java.awt.Color(v, v, v).getRGB)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val resized = Multimodal.resizeToPgm(bos.toByteArray, 1, 2)
    val headerLen = "P5\n1 2\n255\n".length
    assert((resized(headerLen) & 0xff) == 255 &&
      (resized(headerLen + 1) & 0xff) == 0)
  }

  test("decodeWav parses a JDK-written WAV; audioFeatures flags non-audio") {
    // 0.5 s of 16-bit mono PCM at 8 kHz, encoded by the JDK's own
    // javax.sound.sampled writer, parsed by the pure RIFF walker
    val n = 4000
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](n * 2)), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val m = Multimodal.decodeWav(bos.toByteArray)
    assert(m.sample_rate == 8000 && m.channels == 1 &&
      m.bits_per_sample == 16 && m.n_frames == 4000L)
    assert(math.abs(m.duration_sec - 0.5) < 1e-12)
    // DataFrame path: the WAV row decodes for real, a text payload is
    // a zeroed row with decoded = false — never fabricated audio params
    val media = Seq((0L, bos.toByteArray, "audio"),
      (1L, "not audio at all".getBytes("UTF-8"), "audio"))
      .toDF("doc_id", "media", "media_type")
    val got = Multimodal.audioFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("decoded") &&
      got(0L).getAs[Int]("sample_rate") == 8000 &&
      got(0L).getAs[Long]("n_frames") == 4000L)
    assert(!got(1L).getAs[Boolean]("decoded") &&
      got(1L).getAs[Int]("sample_rate") == 0)
  }

  test("extractFeatures decoded flag: true for real rasters, false for stub") {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8)
      img.setRGB(x, y, new java.awt.Color(42, 42, 42).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val media = Seq((0L, bos.toByteArray, "image"),
      (1L, "plain text payload".getBytes("UTF-8"), "image"))
      .toDF("doc_id", "media", "media_type")
    val got = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("decoded") &&
      got(0L).getAs[Int]("width") == 8 &&
      got(0L).getAs[Double]("mean_intensity") == 42.0)
    assert(!got(1L).getAs[Boolean]("decoded"))
  }

  test("resizeToPgm downsamples a PGM; output re-decodes with exact dims") {
    // 4×4 gradient: pixel value = 16·(y·4 + x); nearest-neighbor 2×2
    // picks source pixels (0,0),(2,0),(0,2),(2,2) → 0, 32, 128, 160
    val header = "P5\n4 4\n255\n".getBytes("US-ASCII")
    val pixels = Array.tabulate(16)(i => (16 * i).toByte)
    val resized = Multimodal.resizeToPgm(header ++ pixels, 2, 2)
    val (w, h, mean) = Multimodal.decode(resized)
    assert(w == 2 && h == 2)
    assert(mean == (0 + 32 + 128 + 160) / 4.0)
    // a real BMP resizes through the channel-averaged accessor
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8)
      img.setRGB(x, y, new java.awt.Color(90, 90, 90).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val (bw, bh, bmean) = Multimodal.decode(
      Multimodal.resizeToPgm(bos.toByteArray, 3, 3))
    assert(bw == 3 && bh == 3 && bmean == 90.0)
    // codec formats get the deterministic stub raster, still valid PGM
    val stub = Multimodal.resizeToPgm("not an image".getBytes, 5, 5)
    val (sw, sh, _) = Multimodal.decode(stub)
    assert(sw == 5 && sh == 5)
  }

  test("resize preserves BMP orientation (bottom-up files are not flipped)") {
    // 4×4 BMP: top half white, bottom half black. ImageIO writes
    // bottom-up BMPs (positive height), so a row-order-naive accessor
    // would emit the black half on top of the thumbnail.
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) {
      val v = if (y < 2) 255 else 0
      img.setRGB(x, y, new java.awt.Color(v, v, v).getRGB)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val resized = Multimodal.resizeToPgm(bos.toByteArray, 1, 2)
    val headerLen = "P5\n1 2\n255\n".length
    val top = resized(headerLen) & 0xff
    val bottom = resized(headerLen + 1) & 0xff
    assert(top == 255 && bottom == 0,
      s"thumbnail vertically flipped: top=$top bottom=$bottom")
  }

  test("resizeMedia maps every item to the target thumbnail, id-stable") {
    val media = Multimodal.asMedia(
      Seq((0L, "alpha beta"), (1L, "gamma"), (2L, "delta"))
        .toDF("doc_id", "text"))
    val out = Multimodal.resizeMedia(media, 4, 4).collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
    out.foreach { r =>
      val (w, h, _) = Multimodal.decode(r.getAs[Array[Byte]]("media"))
      assert(w == 4 && h == 4)
    }
  }

  test("video items sample frames, others exactly 1") {
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs))
    val frames = f.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("frames_sampled"))
      .toMap
    assert(frames(0L) == 1 && frames(1L) == 1)
    assert(frames(2L) >= 1) // video path
  }

  test("dHash catches a re-encoded duplicate: BMP vs its PGM thumbnail " +
      "pair through the banded join, unrelated images apart") {
    // a real gradient image, BMP-encoded; its "re-encode" is the 32×32
    // PGM thumbnail (different format, different resolution, same
    // picture); a third unrelated image (inverted gradient + stripes)
    def gradient(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 48) {
        val v = if (seed == 0) (x * 4) % 256
          else 255 - (x * 4) % 256 ^ (if (y % 8 < 4) 96 else 0)
        img.setRGB(x, y, new java.awt.Color(v, v, v).getRGB)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val bmp = gradient(0)
    val reenc = Multimodal.resizeToPgm(bmp, 32, 32)
    val other = gradient(1)
    val da = Multimodal.dHash64(bmp)
    val db = Multimodal.dHash64(reenc)
    val dc = Multimodal.dHash64(other)
    assert(java.lang.Long.bitCount(da ^ db) <= 3,
      s"re-encode drifted ${java.lang.Long.bitCount(da ^ db)} bits")
    assert(java.lang.Long.bitCount(da ^ dc) > 3,
      "unrelated image landed within the near-dup radius")
    // end-to-end: the banded join surfaces exactly the planted pair
    val media = Seq((1L, bmp, "image"), (2L, reenc, "image"),
      (3L, other, "image")).toDF("doc_id", "media", "media_type")
    val pairs = graft.ext.Dedup.bandPairs64(
      Multimodal.dhashMedia(media), "dhash", hamMax = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("audioFingerprint64 is invariant to WAV container re-encoding " +
      "and catches the pair through the banded join") {
    // a deterministic "audio" signal: 1 kB of a slow byte ramp + wobble
    val pcm = Array.tabulate[Byte](1024)(i =>
      ((i / 8 + 13 * math.sin(i / 40.0)).toInt & 0xff).toByte)
    val wav = Multimodal.wavOf(pcm)
    // re-encode: same PCM, extra LIST metadata chunk before data
    val reenc = Multimodal.wavOf(pcm, extraChunk = true)
    assert(!java.util.Arrays.equals(wav, reenc),
      "re-encode must differ at the container level")
    val fa = Multimodal.audioFingerprint64(wav)
    val fb = Multimodal.audioFingerprint64(reenc)
    assert(fa == fb, "container framing leaked into the fingerprint")
    // the RIFF seam is real: the WAV fingerprints exactly its PCM
    // bytes (the data chunk was located, headers excluded)
    assert(Multimodal.audioFingerprint64(pcm) == fa,
      "WAV payload must fingerprint its PCM, not its framing")
    // an unrelated signal lands far away
    val other = Multimodal.wavOf(Array.tabulate[Byte](1024)(i =>
      ((255 - i / 4 + (if (i % 16 < 8) 64 else 0)) & 0xff).toByte))
    val fc = Multimodal.audioFingerprint64(other)
    assert(java.lang.Long.bitCount(fa ^ fc) > 3,
      "unrelated audio landed within the near-dup radius")
    // end-to-end: banding surfaces exactly the planted pair
    val media = Seq((1L, wav, "audio"), (2L, reenc, "audio"),
      (3L, other, "audio")).toDF("doc_id", "media", "media_type")
    val pairs = graft.ext.Dedup.bandPairs64(
      Multimodal.afpMedia(media), "afp", hamMax = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // degenerate payloads are total: empty and null fingerprint to 0
    assert(Multimodal.audioFingerprint64(Array.emptyByteArray) == 0L)
    assert(Multimodal.audioFingerprint64(null) == 0L)
  }
}
