package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.SketchEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming rebind (§7.6): event-time windows finalize under
  * watermark; stateful change scores match the batch operator.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("windowedEventCounts finalizes closed hourly windows (append)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val counts = StreamOps.windowedEventCounts(
      mem.toDF.toDF("ts", "event_type", "value"),
      size = "1 hour", watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("wec")
      .outputMode("append").start()
    try {
      mem.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0),
        (ts(70), "view", 5.0))
      q.processAllAvailable()
      // advance watermark past hour 0 so its window closes
      mem.addData((ts(200), "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("wec")
        .select($"event_type", $"n", $"sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(got.contains(("click", 2L, 3.0)))
      assert(got.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("slidingOutFeatures emits overlapping sliding windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val feats = StreamOps.slidingOutFeatures(
      mem.toDF.toDF("ts", "src", "weight"),
      size = "2 hours", slide = "1 hour", watermark = "0 seconds")
    val q = feats.writeStream.format("memory").queryName("sof")
      .outputMode("append").start()
    try {
      mem.addData((ts(90), 7L, 10L), (ts(100), 7L, 20L))
      q.processAllAvailable()
      mem.addData((ts(600), 8L, 1L)) // advance watermark far ahead
      q.processAllAvailable()
      val got = spark.table("sof")
        .filter($"account" === 7L)
        .select($"multi_out_degree", $"total_out_weight")
        .as[(Long, Long)].collect().toSet
      // ts 90/100 fall in sliding windows [0,2h) and [1h,3h)
      assert(got == Set((2L, 30L)))
      assert(spark.table("sof").filter($"account" === 7L).count() == 2)
    } finally q.stop()
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("ts", "text_hash")
    val dd = StreamOps.streamingDedup(docs)
    val q = dd.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(
        f"2024-01-01 10:$min%02d:00")
      mem.addData((t(0), "a"), (t(1), "a"), (t(2), "b"), (t(3), "a"))
      q.processAllAvailable()
      val got = spark.table("dedup").select($"text_hash")
        .as[String].collect().toSeq
      assert(got.sorted == Seq("a", "b")) // re-deliveries of "a" dropped
    } finally q.stop()
  }

  test("streaming near-dup catches a re-worded duplicate in-stream") {
    implicit val sq = spark.sqlContext
    // one-word rewording: 13 of 17 distinct 3-gram shingles shared
    // (Jaccard ≈ 0.76 → ≥1 of 4 two-row bands collides w.h.p., and
    // deterministically for THESE strings — the batch cross-check below
    // asserts the collision rather than assuming it)
    val tA = "the quick brown fox jumps over the lazy dog near the old " +
      "river bank every sunny morning"
    val tB = "the quick brown fox jumps over the lazy dog near the old " +
      "river bank every sunny evening"
    val tC = "completely different content about spark structured " +
      "streaming stateful operators and watermarks"
    // batch precondition: the SAME (k=8, bands=4) banding pairs 1-3
    val batchPairs = graft.ext.Dedup.minhashLshPairs(
        Seq((1L, tA), (3L, tB), (2L, tC)).toDF("doc_id", "text"),
        k = 8, bands = 4, minJaccard = 0.0)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 3L)))

    val mem = MemoryStream[(Timestamp, Long, String)]
    val cands = StreamOps.streamingNearDupCandidates(
      mem.toDF.toDF("ts", "doc_id", "text"),
      k = 8, bands = 4, watermark = "10 minutes")
    val q = cands.writeStream.format("memory").queryName("snd")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), 1L, tA), (ts(1), 2L, tC))
      q.processAllAvailable()
      mem.addData((ts(2), 3L, tB)) // the rewording arrives a batch later
      q.processAllAvailable()
      val got = spark.table("snd").select($"docId", $"dupOf")
        .distinct().as[(Long, Long)].collect().toSet
      assert(got == Set((3L, 1L))) // caught in-stream; tC pairs nothing

      // state expiry: push the watermark far past the horizon (timeouts
      // fire on the batch AFTER the one that advances the watermark),
      // then re-send tA as doc 4 — the old bucket owner has expired, so
      // doc 4 claims a fresh bucket and no stale (4,1) pair appears
      mem.addData((ts(600), 8L, "advance the event time watermark now"))
      q.processAllAvailable()
      mem.addData((ts(601), 9L, "keep advancing so timeouts actually fire"))
      q.processAllAvailable()
      mem.addData((ts(602), 4L, tA))
      q.processAllAvailable()
      val after = spark.table("snd").select($"docId", $"dupOf")
        .distinct().as[(Long, Long)].collect().toSet
      assert(!after.contains((4L, 1L)))
    } finally q.stop()
  }

  test("stateful change scores match the batch operator") {
    implicit val sq = spark.sqlContext
    // deterministic sketch stream: 5 windows × 4-dim sketches, one burst
    val sketches = (0 to 5).map { w =>
      val base = Array(1.0, 2.0, 3.0, 4.0)
      val v = if (w == 5) base.map(_ * 10).reverse else base
      SketchEvent(0L, w.toLong, v)
    }
    val mem = MemoryStream[SketchEvent]
    val scored = StreamOps.changeScores(mem.toDS(), backWs = 3)
    val q = scored.writeStream.format("memory").queryName("cs")
      .outputMode("append").start()
    try {
      mem.addData(sketches: _*)
      q.processAllAvailable()
      val got = spark.table("cs")
        .select($"wid", $"changeScore").as[(Long, Double)]
        .collect().toMap
      // first scoreable window: wid=3 (needs frame {1,2} → backWs−1=2)
      assert(got.keySet == Set(3L, 4L, 5L))
      assert(got(3L) < 1e-9) // identical direction → zero change
      assert(got(5L) > got(4L)) // the burst window spikes
    } finally q.stop()
  }

  test("streamingIntervalJoin pairs out-of-order points with open intervals") {
    implicit val sq = spark.sqlContext
    val ivs = MemoryStream[(Long, Timestamp, Timestamp)]
    val pts = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.streamingIntervalJoin(
      pts.toDF.toDF("pid", "pts"), "pts",
      ivs.toDF.toDF("iid", "s0", "s1"), "s0", "s1",
      maxIntervalSeconds = 7200L, bucketSeconds = 600L,
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sij")
      .outputMode("append").start()
    try {
      // batch 1: two sessions open (one spans multiple 10-min buckets),
      // one point inside the first
      ivs.addData((100L, ts(0), ts(45)), (200L, ts(60), ts(70)))
      pts.addData((1L, ts(10)))
      q.processAllAvailable()
      // batch 2: a LATE point @40 (behind point 1's event time, inside
      // the watermark) still matches session 100 exactly once despite
      // the bucket replication; @65 matches session 200; @50 is covered
      // by nothing
      pts.addData((2L, ts(65)), (3L, ts(40)), (4L, ts(50)))
      q.processAllAvailable()
      val got = spark.table("sij").select($"pid", $"iid")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == Seq((1L, 100L), (2L, 200L), (3L, 100L)))
    } finally q.stop()
  }

  test("streamingOverlapJoin pairs out-of-order intervals exactly once") {
    implicit val sq = spark.sqlContext
    val ls = MemoryStream[(Long, Timestamp, Timestamp)]
    val rs = MemoryStream[(Long, Timestamp, Timestamp)]
    val out = StreamOps.streamingOverlapJoin(
      ls.toDF.toDF("lid", "l0", "l1"), "l0", "l1",
      rs.toDF.toDF("rid", "r0", "r1"), "r0", "r1",
      maxIntervalSeconds = 7200L, bucketSeconds = 600L,
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sovl")
      .outputMode("append").start()
    try {
      // batch 1: left [0,45] spans multiple 10-min buckets; right [30,50]
      // overlaps it (must emit once despite 2+ shared bins), right
      // [60,70] does not
      ls.addData((1L, ts(0), ts(45)))
      rs.addData((10L, ts(30), ts(50)), (20L, ts(60), ts(70)))
      q.processAllAvailable()
      // batch 2: a LATE left [40,65] (behind batch 1's event times,
      // inside the watermark) overlaps BOTH rights — the closed-bound
      // touch at 40 ≤ 50 and the span into [60,70]
      ls.addData((2L, ts(40), ts(65)))
      q.processAllAvailable()
      val got = spark.table("sovl").select($"lid", $"rid")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == Seq((1L, 10L), (2L, 10L), (2L, 20L)))
    } finally q.stop()
  }

  test("streamingAsof matches each point to the update current at its ts") {
    implicit val sq = spark.sqlContext
    val upd = MemoryStream[(Long, Timestamp, Double)]
    val pts = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.streamingAsof(
      pts.toDF.toDF("key", "ts"),
      upd.toDF.toDF("key", "ts", "value"), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sasof")
      .outputMode("append").start()
    try {
      // batch 1: update @10, points @5 (before any update) and @10
      // (equal ts → inclusive match)
      upd.addData((1L, ts(10), 1.0))
      pts.addData((1L, ts(5)), (1L, ts(10)))
      q.processAllAvailable()
      // batch 2: update @30; an out-of-order point @20 must still see
      // the @10 value (history, not latest-wins), a point @40 sees @30
      upd.addData((1L, ts(30), 2.0))
      pts.addData((1L, ts(40)), (1L, ts(20)))
      q.processAllAvailable()
      val got = spark.table("sasof")
        .select($"ts", $"asofValue").as[(Timestamp, Option[Double])]
        .collect().toMap
      assert(got(ts(5)) == None)
      assert(got(ts(10)) == Some(1.0))
      assert(got(ts(20)) == Some(1.0))
      assert(got(ts(40)) == Some(2.0))
    } finally q.stop()
  }

  test("streaming hll registers equal batch; state bounded at m per group") {
    import graft.ext.Sketches
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    val rows = mem.toDF.select(lit("all").as("g"), col("value").as("k"))
    val q = StreamOps.streamingHllRegisters(rows, "k", "g")
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      mem.addData(1L to 3000L: _*)
      q.processAllAvailable()
      // second batch overlaps the first: re-delivered keys must not move
      // any register (max-merge idempotence — the mergeability that makes
      // the sketch a valid streaming/partial-agg state)
      mem.addData(2000L to 5000L: _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_regs")
      assert(streamed.count() <= Sketches.M.toLong,
        "register state exceeded m rows")
      val est = Sketches.hllEstimateFromRegisters(streamed, Seq("g0"))
        .collect().head
      val batch = Sketches.hllDistinct(
        (1L to 5000L).toDF("k").withColumn("g", lit("all")),
        col("k"), Seq(col("g"))).collect().head
      assert(est.getAs[Long]("denom_scaled") ===
        batch.getAs[Long]("denom_scaled"))
      assert(est.getAs[Double]("hll_estimate") ===
        batch.getAs[Double]("hll_estimate"))
    } finally q.stop()
  }

  test("streaming cm grid equals the batch grid cell-for-cell") {
    import graft.ext.Sketches
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val rows = mem.toDF.select(col("value").as("word"))
    val q = StreamOps.streamingCmGrid(rows, "word")
      .writeStream.format("memory").queryName("cm_grid")
      .outputMode("complete").start()
    try {
      val words = (1 to 400).map(i => s"w${i % 13}")
      mem.addData(words.take(150): _*)
      q.processAllAvailable()
      mem.addData(words.drop(150): _*)
      q.processAllAvailable()
      val streamed = spark.table("cm_grid").collect()
        .map(r => (r.getAs[Int]("row_i"), r.getAs[Long]("bucket")) ->
          r.getAs[Long]("cnt")).toMap
      assert(streamed.size <= Sketches.CmDepth * Sketches.CmWidth,
        "grid state exceeded d*w cells")
      val batch = Sketches.cmGrid(words.toDF("word"), "word").collect()
        .map(r => (r.getAs[Int]("row_i"), r.getAs[Long]("bucket")) ->
          r.getAs[Long]("cnt")).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming snapshot: the upsert stream compacts to the batch " +
      "q104 snapshot; a late loser never re-emits") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val rows = mem.toDF.toDF("user_id", "event_id", "ts", "event_type",
      "value")
    val q = StreamOps.streamingSnapshot(rows)
      .writeStream.format("memory").queryName("snap_out")
      .outputMode("update").start()
    try {
      // user 1: two versions in order; user 2: one version
      mem.addData((1L, 10L, ts(10), "a", 1.0), (2L, 11L, ts(5), "b", 2.0))
      q.processAllAvailable()
      mem.addData((1L, 20L, ts(30), "c", 3.0))
      q.processAllAvailable()
      val afterWin = spark.table("snap_out").count()
      // batch 1 emits both keys, batch 2 re-emits user 1's new winner
      assert(afterWin == 3L)
      // a LATE event that loses by (ts, event_id) must not emit or
      // disturb the state (arbitrary lateness is legal here — no
      // watermark drops it, the order rule rejects it)
      mem.addData((1L, 5L, ts(20), "late-loser", 99.0))
      q.processAllAvailable()
      assert(spark.table("snap_out").count() == 3L,
        "late loser re-emitted")
      // compact: latest emitted row per key == batch latestSnapshot
      val all = Seq(
        (1L, 10L, ts(10), "a", 1.0), (2L, 11L, ts(5), "b", 2.0),
        (1L, 20L, ts(30), "c", 3.0), (1L, 5L, ts(20), "late-loser", 99.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
      val batch = graft.ops.TimeSeries.latestSnapshot(all, "user_id",
        "ts", "event_id", Seq("event_type", "value")).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("last_ts"), r.getAs[Long]("last_event_id"),
            r.getAs[String]("last_event_type"),
            r.getAs[Double]("last_value"))).toMap
      val streamed = spark.table("snap_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("userId"))
            .orderBy(col("lastTs").desc, col("lastEventId").desc)))
        .filter(col("rk") === 1)
        .select(col("userId"),
          date_format(col("lastTs"), "yyyy-MM-dd HH:mm:ss").as("t"),
          col("lastEventId"), col("lastEventType"), col("lastValue"))
        .collect()
        .map(r => r.getAs[Long]("userId") ->
          (r.getAs[String]("t"), r.getAs[Long]("lastEventId"),
            r.getAs[String]("lastEventType"),
            r.getAs[Double]("lastValue"))).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming changelog apply: latest emit per key applied to a " +
      "base equals the batch last-writer-wins apply; stale records " +
      "never emit; a tombstone's seq blocks older resurrections") {
    implicit val sq = spark.sqlContext
    // (event_id, op, seq, ts, user_id, event_type, value)
    val mem = MemoryStream[(Long, String, Long, Option[Timestamp],
      Option[Long], Option[String], Option[Double])]
    val rows = mem.toDF.toDF("event_id", "op", "seq", "ts", "user_id",
      "event_type", "value")
    val q = StreamOps.streamingChangelog(rows)
      .writeStream.format("memory").queryName("clog_out")
      .outputMode("update").start()
    val b1 = Seq(
      (1L, "U", 2L, Some(ts(10)), Some(100L), Some("corrected"),
        Some(1.5)),                                    // update key 1
      (2L, "I", 1L, Some(ts(11)), Some(200L), Some("ins"), Some(2.5)),
      (3L, "D", 3L, None, None, None, None))           // delete key 3
    val b2 = Seq(
      (2L, "U", 2L, Some(ts(20)), Some(200L), Some("ins"),
        Some(3.5)),                         // key 2: I then U wins
      (2L, "I", 1L, Some(ts(11)), Some(200L), Some("stale"),
        Some(9.9)),                         // replay of the I: no-op
      (1L, "D", 3L, None, None, None, None), // key 1: now deleted
      (3L, "U", 2L, Some(ts(22)), Some(300L), Some("zombie"),
        Some(7.7)))                          // older than 3's D
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.table("clog_out").count() == 3L)
      mem.addData(b2: _*)
      q.processAllAvailable()
      // batch 2 re-emits keys 1 and 2; the stale I and the zombie U
      // (both lower (seq, op) than the state) must NOT emit
      val emits = spark.table("clog_out").collect()
      assert(emits.length == 5L, s"got ${emits.toSeq}")
      // apply the latest emit per key to a base; compare with the batch
      // operator's window (seq DESC, op DESC) over the FULL log
      val base = Seq(
        (1L, ts(1), 100L, "orig", 1.0), (3L, ts(3), 300L, "orig", 3.0),
        (4L, ts(4), 400L, "orig", 4.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val log = (b1 ++ b2).toDF("event_id", "op", "seq", "ts",
        "user_id", "event_type", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_id"))
        .orderBy(col("seq").desc, col("op").desc)
      val last = log.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val expected = base.join(last, Seq("event_id"), "left_anti")
        .unionByName(last.filter(col("op") =!= "D")
          .select("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(r => r.getLong(0) ->
          (r.getTimestamp(1), r.getLong(2), r.getString(3),
            r.getDouble(4))).toMap
      val latest = spark.table("clog_out")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("eventId"))
            .orderBy(col("seq").desc, col("op").desc)))
        .filter(col("rn") === 1)
      val applied = base
        .join(latest.select(col("eventId").as("event_id")),
          Seq("event_id"), "left_anti")
        .unionByName(latest.filter(col("op") =!= "D")
          .select(col("eventId").as("event_id"), col("ts"),
            col("userId").as("user_id"),
            col("eventType").as("event_type"), col("value")))
        .collect().map(r => r.getLong(0) ->
          (r.getTimestamp(1), r.getLong(2), r.getString(3),
            r.getDouble(4))).toMap
      assert(applied === expected)
      // keys surviving: 2 (inserted+updated), 4 (untouched); 1, 3 deleted
      assert(applied.keySet == Set(2L, 4L))
    } finally q.stop()
  }

  test("streaming phash candidates: a re-encoded image caught against " +
      "its in-horizon original; bands match the batch pairing") {
    implicit val sq = spark.sqlContext
    // a gradient BMP and its PGM thumbnail (the MultimodalSpec pair),
    // plus an unrelated inverted/striped image
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
    val reenc = graft.ext.Multimodal.resizeToPgm(bmp, 32, 32)
    val other = gradient(1)
    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamOps.streamingPhashCandidates(
      mem.toDF.toDF("doc_id", "ts", "media"))
      .writeStream.format("memory").queryName("phash_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(10), bmp), (3L, ts(11), other))
      q.processAllAvailable()
      assert(spark.table("phash_out").count() == 0L,
        "unrelated images must not pair")
      mem.addData((2L, ts(12), reenc))
      q.processAllAvailable()
      val got = spark.table("phash_out")
        .select("docId", "dupOf").as[(Long, Long)].collect().toSet
      assert(got == Set((2L, 1L)), s"got $got")
      // band identity equals the batch pairing's blocks: every emitted
      // band is one where the two dhashes agree exactly
      val da = graft.ext.Multimodal.dHash64(bmp)
      val db = graft.ext.Multimodal.dHash64(reenc)
      val agreeing = (0 until 4).filter(b =>
        ((da >> (16 * b)) & 0xffffL) == ((db >> (16 * b)) & 0xffffL))
      val bandsGot = spark.table("phash_out")
        .select("bandId").as[Int].collect().toSet
      assert(bandsGot.subsetOf(agreeing.toSet) && bandsGot.nonEmpty)
    } finally q.stop()
  }

  test("streaming afp candidates: a container-re-encoded WAV caught " +
      "against its in-horizon original; bands match the batch pairing") {
    implicit val sq = spark.sqlContext
    val pcm = Array.tabulate[Byte](1024)(i =>
      ((i / 8 + 13 * math.sin(i / 40.0)).toInt & 0xff).toByte)
    val wav = graft.ext.Multimodal.wavOf(pcm)
    val reenc = graft.ext.Multimodal.wavOf(pcm, extraChunk = true)
    val other = graft.ext.Multimodal.wavOf(
      Array.tabulate[Byte](1024)(i =>
        ((255 - i / 4 + (if (i % 16 < 8) 64 else 0)) & 0xff).toByte))
    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamOps.streamingAfpCandidates(
      mem.toDF.toDF("doc_id", "ts", "media"))
      .writeStream.format("memory").queryName("afp_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(10), wav), (3L, ts(11), other))
      q.processAllAvailable()
      assert(spark.table("afp_out").count() == 0L,
        "unrelated audio must not pair")
      mem.addData((2L, ts(12), reenc))
      q.processAllAvailable()
      val got = spark.table("afp_out")
        .select("docId", "dupOf").as[(Long, Long)].collect().toSet
      assert(got == Set((2L, 1L)), s"got $got")
      // container invariance: the re-encode's fingerprint is the
      // original's, so EVERY one of the 4 bands agrees
      assert(spark.table("afp_out").select("bandId").as[Int]
        .collect().toSet == Set(0, 1, 2, 3))
    } finally q.stop()
  }

  test("TxLog.appendSink: micro-batches land as versioned append " +
      "commits; a replayed batch is skipped (exactly-once append)") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sink")
    val tbl = root.resolve("t").toString
    val mem = MemoryStream[(Long, Int, Double)]
    val sink = graft.ops.TxLog.appendSink(tbl, "part", appId = "specapp",
      statsCols = Seq("id"))
    val q = mem.toDF.toDF("id", "part", "v")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try {
      mem.addData((1L, 1, 1.0), (2L, 2, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 1, 3.0))
      q.processAllAvailable()
      assert(graft.ops.TxLog.currentVersion(tbl) == 1)
      assert(graft.ops.TxLog.txnOf(tbl, 0).contains(("specapp", 0L)) &&
        graft.ops.TxLog.txnOf(tbl, 1).contains(("specapp", 1L)))
      assert(graft.ops.TxLog.lastCommittedBatch(tbl, "specapp") == 1L)
      // at-least-once replay of batch 1 (post-crash re-delivery): the
      // txn fence skips it — no new version, no duplicate rows
      sink(Seq((3L, 1, 3.0)).toDF("id", "part", "v"), 1L)
      assert(graft.ops.TxLog.currentVersion(tbl) == 1)
      assert(graft.ops.TxLog.readVersion(spark, tbl, 1).count() == 3L)
      // the next batch id still lands
      sink(Seq((4L, 2, 4.0)).toDF("id", "part", "v"), 2L)
      assert(graft.ops.TxLog.currentVersion(tbl) == 2)
      assert(graft.ops.TxLog.readVersion(spark, tbl, 2)
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
      // appended files carried stats (the sink is a full commit citizen)
      assert(graft.ops.TxLog.entriesOf(tbl, 2)
        .exists(e => e.path.startsWith("v2/") && e.stats.contains("id")))
      // a different app's fence is independent
      assert(graft.ops.TxLog.lastCommittedBatch(tbl, "otherapp") == -1L)
    } finally q.stop()
  }

  test("streaming cdc extract: two snapshot streams drain to exactly " +
      "the batch cdcExtract I/U/D feed; unchanged keys never emit") {
    implicit val sq = spark.sqlContext
    // (event_id, ts, user_id, event_type, value) per side
    val memA = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val memB = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val names = Seq("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.streamingCdcExtract(
      memA.toDF.toDF(names: _*), memB.toDF.toDF(names: _*),
      horizonMs = 300000L) // 5 min
      .writeStream.format("memory").queryName("cdcx_out")
      .outputMode("append").start()
    // v0: keys 1 (will vanish), 2 (unchanged), 3 (will change)
    val v0 = Seq((1L, ts(10), 100L, "orig", 1.0),
      (2L, ts(11), 200L, "orig", 2.0), (3L, ts(12), 300L, "orig", 3.0))
    // v1: 2 unchanged (different ts — ts is NOT payload), 3 changed,
    // 4 new
    val v1 = Seq((2L, ts(13), 200L, "orig", 2.0),
      (3L, ts(14), 300L, "changed", 3.5), (4L, ts(15), 400L, "new", 4.0))
    try {
      memA.addData(v0: _*)
      q.processAllAvailable()
      memB.addData(v1: _*)
      q.processAllAvailable()
      // matched keys (2, 3) settle immediately: only the U emits
      val early = spark.table("cdcx_out").collect()
      assert(early.map(_.getString(0)).toSeq == Seq("U"), // op col first
        s"got ${early.toSeq}")
      // advance the watermark past ts(15) + horizon so the half-joined
      // keys (1: only-a, 4: only-b) finalize by timeout; the sentinel
      // pair is identical on both sides, so it emits nothing itself
      memA.addData((999L, ts(500), 0L, "wm", 0.0))
      memB.addData((999L, ts(500), 0L, "wm", 0.0))
      q.processAllAvailable()
      memA.addData((998L, ts(501), 0L, "wm", 0.0))
      memB.addData((998L, ts(501), 0L, "wm", 0.0))
      q.processAllAvailable()
      val got = spark.table("cdcx_out")
        .select("op", "eventId", "userId", "eventType", "value")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
      // the batch operator over the same snapshots
      val expected = graft.ops.TimeSeries.cdcExtract(
        v0.toDF(names: _*), v1.toDF(names: _*), "event_id",
        Seq("user_id", "event_type", "value"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
      assert(got == expected, s"stream $got vs batch $expected")
      assert(got.map(t => (t._1, t._2)) ==
        Set(("D", 1L), ("U", 3L), ("I", 4L)))
    } finally q.stop()
  }

  test("streaming moving average equals the batch RANGE frame on " +
      "in-order input; state prunes to the horizon") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val rows = mem.toDF.toDF("user_id", "event_id", "ts", "value")
    val q = StreamOps.streamingMovingAvg(rows, frameSeconds = 600L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("ma_out")
      .outputMode("append").start()
    try {
      // offset from epoch 0: the initial watermark IS epoch 0 and rows
      // at/behind it are dropped as late before reaching the state fn
      def ts(min: Long) = new java.sql.Timestamp((min + 1000) * 60000L)
      // two users, events every 2 min with a value ramp; in-order feed
      val evs = (0L until 60L).flatMap(i => Seq(
        (1L, i * 2, ts(i * 2), i.toDouble),
        (2L, i * 2 + 1, ts(i * 2), (i * 3).toDouble)))
      mem.addData(evs.take(60): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(60): _*)
      q.processAllAvailable()
      // no re-rounding: the twin emits the batch face's round(avg, 6)
      // itself, so equality is byte-for-byte
      val got = spark.table("ma_out").collect()
        .map(r => (r.getAs[Long]("userId"), r.getAs[Long]("eventId")) ->
          (r.getAs[Long]("nFrame"), r.getAs[Double]("avg1h"))).toMap
      // batch RANGE frame on the same rows (the q108 shape)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts"))).rangeBetween(-600L, 0L)
      val want = evs.toDF("user_id", "event_id", "ts", "value")
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n"),
          round(avg(col("value")).over(w), 6).as("a"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("a"))).toMap
      assert(got.size == want.size)
      want.foreach { case (k, v) =>
        assert(got(k) === v, s"frame diverged at $k")
      }
    } finally q.stop()
  }

  test("streaming dyadic-cm grid equals the batch grid cell-for-cell") {
    import graft.ext.Sketches
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    val rows = mem.toDF.select(col("value").as("v"))
    val q = StreamOps.streamingDcmGrid(rows, "v")
      .writeStream.format("memory").queryName("dcm_grid")
      .outputMode("complete").start()
    try {
      val values = (0L until 500L).map(i => i * 37 % 3000)
      mem.addData(values.take(200): _*)
      q.processAllAvailable()
      mem.addData(values.drop(200): _*)
      q.processAllAvailable()
      def toMap(rs: Array[org.apache.spark.sql.Row]) = rs
        .map(r => (r.getAs[Int]("lvl"), r.getAs[Int]("row_i"),
          r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
      val streamed = toMap(spark.table("dcm_grid").collect())
      assert(streamed.size <=
        Sketches.DcmLevels * Sketches.CmDepth * Sketches.DcmWidth,
        "grid state exceeded L*d*w cells")
      val batch = toMap(Sketches.dcmGrid(
        Sketches.dcmClamp(values.toDF("v"), "v")).collect())
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming sessions equal the batch q41 session_window face") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val rows = mem.toDF.toDF("user_id", "ts", "value")
    val q = StreamOps.streamingSessions(rows, gap = "30 minutes",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two sessions split by a >30 min gap (the second session
      // merges events arriving in DIFFERENT micro-batches — the merge is
      // what session_window's state handles); user 2: one session
      mem.addData((1L, ts(10), 1.0), (1L, ts(25), 2.0),
        (2L, ts(15), 5.0))
      q.processAllAvailable()
      mem.addData((1L, ts(90), 3.0), (1L, ts(100), 4.0))
      q.processAllAvailable()
      // far-future event: advances the watermark so every real session
      // finalizes (its own session stays open and must NOT emit)
      mem.addData((9L, ts(2000), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = Seq((1L, ts(10), 1.0), (1L, ts(25), 2.0),
          (2L, ts(15), 5.0), (1L, ts(90), 3.0), (1L, ts(100), 4.0))
        .toDF("user_id", "ts", "value")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 6).as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"),
            "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got === batch)
      assert(!got.exists(_._1 == 9L), "open session emitted")
    } finally q.stop()
  }
}
