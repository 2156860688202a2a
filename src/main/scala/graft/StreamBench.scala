package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Throughput record for the five streaming twins (dev tool, run
  * manually; results recorded in README): each twin drains a synthetic
  * parquet-backed stream under `Trigger.AvailableNow` and reports
  * input-rows/second wall-clock — the round-over-round signal that a
  * regression in the watermark/state-store paths (a state key explosion,
  * a lost pruning condition) would move immediately, which spec-level
  * correctness tests cannot see.
  *
  * Volumes are sized ~100× the sf0.1 bench tables so per-event state
  * work dominates fixed startup. Inputs are deterministic id arithmetic
  * (no RNG); out-of-order arrival inside the watermark horizon is part
  * of each synthesis (ts jitter by id hash) so the stateful paths do
  * real work rather than fast-path appends.
  *
  * Prints one JSON line: per twin, input rows, output rows, seconds,
  * rows/sec.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-sbench")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    def dir(name: String): String = root.resolve(name).toString

    // deterministic ts: base + id-derived offset with hash jitter, so
    // arrivals are out of order within the watermark horizon
    def tsOf(idCol: org.apache.spark.sql.Column, spreadSec: Long) =
      timestamp_seconds(lit(1600000000L) +
        pmod(xxhash64(idCol), lit(spreadSec)))

    def writeIn(name: String, df: DataFrame): (String, org.apache.spark.sql.types.StructType) = {
      val p = dir(name)
      df.repartition(32).write.mode("overwrite").parquet(p)
      (p, spark.read.parquet(p).schema)
    }

    /** Drain `build(readStream)` with AvailableNow; return (outRows, sec). */
    def drain(name: String, inPath: String,
              schema: org.apache.spark.sql.types.StructType,
              build: DataFrame => DataFrame,
              mode: String = "append"): (Long, Double) = {
      val in = spark.readStream.schema(schema).parquet(inPath)
      var out = 0L
      val t0 = System.nanoTime()
      val q = build(in).writeStream
        .outputMode(mode)
        .option("checkpointLocation", dir(s"$name-ckpt"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) => out += b.count(); () }
        .start()
      q.awaitTermination()
      (out, (System.nanoTime() - t0) / 1e9)
    }

    val results =
      scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long, Double, Long)]
    def record(name: String, nIn: Long, outSec: (Long, Double)): Unit = {
      val (nOut, sec) = outSec
      results(name) = (nIn, nOut,
        math.round(sec * 1000) / 1000.0, math.round(nIn / sec))
    }

    // 1. streamingDedup — 500k rows, 20 % re-delivered keys
    val nDedup = 500000L
    val (dedupP, dedupS) = writeIn("dedup-in",
      spark.range(nDedup).select(
        md5(pmod(col("id"), lit((nDedup * 4) / 5)).cast("string"))
          .as("text_hash"),
        tsOf(col("id"), 3000L).as("ts")))
    record("dedup", nDedup,
      drain("dedup", dedupP, dedupS, StreamOps.streamingDedup(_)))

    // 2. streamingNearDupCandidates — 100k short docs, 10 % near-dups
    //    (k=8 HOF signature per event is the CPU knob)
    val nNd = 100000L
    val (ndP, ndS) = writeIn("neardup-in",
      spark.range(nNd).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(29)), p =>
          concat(lit("w"), pmod(xxhash64(
            pmod(col("id"), lit((nNd * 9) / 10)) * 100 + p), lit(5000L)))))
          .as("text"),
        tsOf(col("id"), 3000L).as("ts")))
    record("neardup_cands", nNd,
      drain("neardup", ndP, ndS,
        in => StreamOps.streamingNearDupCandidates(in).toDF))

    // 2b. streamingPhashCandidates — 200k small binary P5 payloads, 10 %
    //     re-encodes of an earlier image (same raster, so the dHash
    //     collides on all four bands): the per-event decode+hash path of
    //     q147's streaming twin
    val nPh = 200000L
    val (phP, phS) = writeIn("phash-in", {
      val gray = udf((seed: Long) => {
        val w = 24 + (seed % 8).toInt; val h = 16 + (seed % 4).toInt
        val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + w * h)
        System.arraycopy(header, 0, out, 0, header.length)
        var i = 0
        while (i < w * h) {
          out(header.length + i) = ((seed * 31 + i * 7) % 251).toByte
          i += 1
        }
        out
      })
      spark.range(nPh).select(
        col("id").as("doc_id"),
        tsOf(col("id"), 3000L).as("ts"),
        gray(pmod(col("id"), lit((nPh * 9) / 10))).as("media"))
    })
    record("phash_cands", nPh,
      drain("phash", phP, phS,
        in => StreamOps.streamingPhashCandidates(in).toDF))

    // 2c. streamingAfpCandidates — 200k WAV payloads (~1 kB PCM each),
    //     10 % container re-encodes of an earlier clip (same PCM → the
    //     fingerprint collides on all four bands): the RIFF-parse +
    //     fingerprint path of q154's streaming twin
    val nAf = 200000L
    val (afP, afS) = writeIn("afp-in", {
      val wavU = udf((seed: Long, reenc: Boolean) => {
        val n = 1024 + (seed % 7).toInt * 64
        val pcm = new Array[Byte](n)
        var i = 0
        while (i < n) { pcm(i) = ((seed * 37 + i * 11) % 249).toByte; i += 1 }
        // the tail 10 % re-wrap an earlier clip's PCM with an extra
        // metadata chunk — a true container re-encode, not a byte copy
        graft.ext.Multimodal.wavOf(pcm, extraChunk = reenc)
      })
      spark.range(nAf).select(
        col("id").as("doc_id"),
        tsOf(col("id"), 3000L).as("ts"),
        wavU(pmod(col("id"), lit((nAf * 9) / 10)),
          col("id") >= (nAf * 9) / 10).as("media"))
    })
    record("afp_cands", nAf,
      drain("afp", afP, afS,
        in => StreamOps.streamingAfpCandidates(in).toDF))

    // 3. streamingAsof — 200k points + 50k updates over 1000 keys
    val nPts = 200000L; val nUpd = 50000L
    val (asofPp, asofPs) = writeIn("asof-pts",
      spark.range(nPts).select(pmod(col("id"), lit(1000L)).as("key"),
        tsOf(col("id"), 3000L).as("ts")))
    val (asofUp, asofUs) = writeIn("asof-upd",
      spark.range(nUpd).select(pmod(col("id"), lit(1000L)).as("key"),
        tsOf(col("id") + 7L, 3000L).as("ts"),
        (col("id") % 97L).cast("double").as("value")))
    record("asof", nPts + nUpd, {
      val upd = spark.readStream.schema(asofUs).parquet(asofUp)
      drain("asof", asofPp, asofPs,
        pts => StreamOps.streamingAsof(pts, upd).toDF)
    })

    // 4. streamingIntervalJoin — 500k points × 50k intervals over a
    //    2.4M-second horizon: pair density ~0.2 points/sec × ~300 s mean
    //    interval ≈ 3M output pairs (a DENSE horizon instead would make
    //    the run measure output materialization, not the join path — the
    //    first draft of this harness emitted 2.5e9 pairs)
    val nIp = 500000L; val nIv = 50000L
    val horizon = 2400000L
    val (ivpP, ivpS) = writeIn("ivl-pts",
      spark.range(nIp).select(col("id").as("pid"),
        tsOf(col("id"), horizon).as("ts")))
    val (ivvP, ivvS) = writeIn("ivl-ivs",
      spark.range(nIv).select(col("id").as("iid"),
        tsOf(col("id") * 3L, horizon).as("s0"),
        timestamp_seconds(
          unix_timestamp(tsOf(col("id") * 3L, horizon)) +
            pmod(col("id"), lit(600L))).as("s1")))
    record("interval_join", nIp + nIv, {
      val ivs = spark.readStream.schema(ivvS).parquet(ivvP)
      drain("ivl", ivpP, ivpS,
        pts => StreamOps.streamingIntervalJoin(pts, "ts", ivs, "s0", "s1",
          maxIntervalSeconds = 600L, bucketSeconds = 600L,
          watermark = "30 minutes"))
    })

    // 5. streamingOverlapJoin — 200k left × 20k right intervals over the
    //    same sparse horizon (~1M output pairs)
    val nL = 200000L; val nR = 20000L
    def ivTable(n: Long, salt: Long, pfx: String) =
      spark.range(n).select(col("id").as(s"${pfx}id"),
        tsOf(col("id") + salt, horizon).as(s"${pfx}0"),
        timestamp_seconds(
          unix_timestamp(tsOf(col("id") + salt, horizon)) +
            pmod(col("id"), lit(300L))).as(s"${pfx}1"))
    val (ovlLp, ovlLs) = writeIn("ovl-l", ivTable(nL, 0L, "l"))
    val (ovlRp, ovlRs) = writeIn("ovl-r", ivTable(nR, 13L, "r"))
    record("overlap_join", nL + nR, {
      val r = spark.readStream.schema(ovlRs).parquet(ovlRp)
      drain("ovl", ovlLp, ovlLs,
        l => StreamOps.streamingOverlapJoin(l, "l0", "l1", r, "r0", "r1",
          maxIntervalSeconds = 600L, bucketSeconds = 600L,
          watermark = "30 minutes"))
    })

    // 6. streamingHllRegisters — 2M keys (20 % re-deliveries) across 8
    //    groups in update mode: the register-maintenance path, whose
    //    state is construction-bounded at 8×256 rows (out rows counts
    //    per-batch register UPDATES, itself bounded by the same 2048)
    val nHll = 2000000L
    val (hllP, hllSch) = writeIn("hll-in",
      spark.range(nHll).select(
        pmod(col("id"), lit((nHll * 4) / 5)).as("k"),
        pmod(col("id"), lit(8L)).cast("string").as("g")))
    record("hll_registers", nHll,
      drain("hll", hllP, hllSch,
        in => StreamOps.streamingHllRegisters(in, "k", "g"),
        mode = "update"))

    // 7. streamingCmGrid — 2M Zipf-ish words in update mode: the d×w
    //    counter maintenance path, state construction-bounded at 4×32
    val nCm = 2000000L
    val (cmP, cmSch) = writeIn("cm-in",
      spark.range(nCm).select(
        concat(lit("w"), pmod(xxhash64(col("id")), lit(1000L)) *
          pmod(xxhash64(col("id") + 1L), lit(7L))).as("word")))
    record("cm_grid", nCm,
      drain("cm", cmP, cmSch,
        in => StreamOps.streamingCmGrid(in, "word"),
        mode = "update"))

    // 8. streamingDcmGrid — 2M skewed values in update mode: the
    //    dyadic-level counter maintenance path (L·d cells per value),
    //    state construction-bounded at ≤ 17·4·64 cells
    val nDcm = 2000000L
    val (dcmP, dcmSch) = writeIn("dcm-in",
      spark.range(nDcm).select(
        pmod(xxhash64(col("id")), lit(5000L)).as("v")))
    record("dcm_grid", nDcm,
      drain("dcm", dcmP, dcmSch,
        in => StreamOps.streamingDcmGrid(in, "v"),
        mode = "update"))

    // 9. streamingMovingAvg — 1M in-order events across 100 users, 10 s
    //    cadence per user, 1-hour frame (≈360 frame entries per state):
    //    the per-event trailing-frame maintenance path
    val nMa = 1000000L
    val (maP, maSch) = writeIn("ma-in",
      spark.range(nMa).select(
        pmod(col("id"), lit(100L)).as("user_id"),
        col("id").as("event_id"),
        timestamp_seconds(lit(1700000000L) +
          (col("id") / 100L).cast("long") * 10L).as("ts"),
        (pmod(col("id"), lit(1000L))).cast("double").as("value")))
    record("moving_avg", nMa,
      drain("ma", maP, maSch,
        in => StreamOps.streamingMovingAvg(in).toDF))

    // 10. streamingSnapshot — 1M events over 50k keys (20 versions per
    //     key, out-of-order by the hash jitter) in update mode: the
    //     per-key winner-maintenance path; out rows count changelog
    //     emissions (≤ one per key per micro-batch)
    val nSnap = 1000000L
    val (snapP, snapSch) = writeIn("snap-in",
      spark.range(nSnap).select(
        pmod(col("id"), lit(50000L)).as("user_id"),
        col("id").as("event_id"),
        tsOf(col("id"), 3000L).as("ts"),
        lit("t").as("event_type"),
        (pmod(col("id"), lit(1000L))).cast("double").as("value")))
    record("snapshot", nSnap,
      drain("snap", snapP, snapSch,
        in => StreamOps.streamingSnapshot(in).toDF,
        mode = "update"))

    // 11b. streamingChangelog — 1M I/U/D records over 50k keys (20
    //     versions per key; every 7th a delete) in update mode: the
    //     per-key last-writer-wins apply path, q139's streaming twin
    val nClog = 1000000L
    val (clogP, clogSch) = writeIn("clog-in",
      spark.range(nClog).select(
        when(pmod(col("id"), lit(7L)) === 0, lit("D"))
          .when(pmod(col("id"), lit(7L)) === 1, lit("I"))
          .otherwise(lit("U")).as("op"),
        (col("id") / 50000L).cast("long").as("seq"),
        pmod(col("id"), lit(50000L)).as("event_id"),
        tsOf(col("id"), 3000L).as("ts"),
        pmod(col("id"), lit(1000L)).as("user_id"),
        lit("t").as("event_type"),
        (pmod(col("id"), lit(1000L))).cast("double").as("value")))
    record("changelog", nClog,
      drain("clog", clogP, clogSch,
        in => StreamOps.streamingChangelog(in).toDF,
        mode = "update"))

    // 11c. streamingCdcExtract — two 500k-key snapshot sides in one
    //     tagged input (split by filter inside the build): key%7==0
    //     only-a (D), %7==1 only-b (I), the rest on both sides with
    //     every third changed (U) — the symmetric half-join path,
    //     q142's streaming twin. A far-future sentinel pair drives the
    //     watermark past the horizon so the half-joined keys finalize
    //     inside the drain.
    val nCdcKeys = 500000L
    val (cdcP, cdcSch) = writeIn("cdcx-in", {
      val keys = spark.range(nCdcKeys)
      val aSide = keys.filter(pmod(col("id"), lit(7L)) =!= 1)
        .select(lit("a").as("side"), col("id").as("event_id"),
          tsOf(col("id"), 3000L).as("ts"),
          pmod(col("id"), lit(1000L)).as("user_id"),
          lit("t").as("event_type"),
          pmod(col("id"), lit(997L)).cast("double").as("value"))
      val bSide = keys.filter(pmod(col("id"), lit(7L)) =!= 0)
        .select(lit("b").as("side"), col("id").as("event_id"),
          tsOf(col("id") + 13L, 3000L).as("ts"),
          pmod(col("id"), lit(1000L)).as("user_id"),
          lit("t").as("event_type"),
          (pmod(col("id"), lit(997L)) +
            when(pmod(col("id"), lit(3L)) === 0, 1L).otherwise(0L))
            .cast("double").as("value"))
      val sentinel = spark.range(1).select(lit("a").as("side"),
          lit(-1L).as("event_id"),
          timestamp_seconds(lit(1601000000L)).as("ts"),
          lit(0L).as("user_id"), lit("wm").as("event_type"),
          lit(0.0).as("value"))
        .unionByName(spark.range(1).select(lit("b").as("side"),
          lit(-1L).as("event_id"),
          timestamp_seconds(lit(1601000000L)).as("ts"),
          lit(0L).as("user_id"), lit("wm").as("event_type"),
          lit(0.0).as("value")))
      aSide.unionByName(bSide).unionByName(sentinel)
    })
    // each side drops 1/7 of the keys, so the honest input count is the
    // written file's own row count (≈ 12/7·keys + 2 sentinels), not
    // 2·keys — the other twins' denominators are exact drained counts
    val nCdcRows = spark.read.schema(cdcSch).parquet(cdcP).count()
    record("cdc_extract", nCdcRows,
      drain("cdcx", cdcP, cdcSch,
        in => StreamOps.streamingCdcExtract(
          in.filter(col("side") === "a"),
          in.filter(col("side") === "b"), horizonMs = 60000L).toDF))

    // 11. streamingSessions — 1M events over 2k users hash-jittered
    //     across a 600k-second horizon (mean per-user gap 20 min vs the
    //     30-min close ⇒ real multi-event sessions that MERGE across
    //     micro-batches, not 1M singletons): the session-window state
    //     merge path, append mode
    val nSess = 1000000L
    val (sessP, sessSch) = writeIn("sess-in",
      spark.range(nSess).select(
        pmod(col("id"), lit(2000L)).as("user_id"),
        tsOf(col("id"), 600000L).as("ts"),
        (pmod(col("id"), lit(1000L))).cast("double").as("value")))
    record("sessions", nSess,
      drain("sess", sessP, sessSch,
        in => StreamOps.streamingSessions(in)))

    // Persist the record as STREAMBENCH_LOCAL.json (full line, never
    // truncated) so streaming throughput diffs round-over-round
    // mechanically, like Bench's BENCH_LOCAL.json: each twin carries the
    // previous record's rows/s as its floor and the ratio against it — a
    // watermark/state-store regression moves `ratio` above 1 immediately.
    // The seed file transcribes the round-9 README record.
    val prevFile = new java.io.File("STREAMBENCH_LOCAL.json")
    val prev: Map[String, Long] =
      if (!prevFile.isFile) Map.empty
      else {
        val body = new String(
          java.nio.file.Files.readAllBytes(prevFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        """"(\w+)":\{[^}]*"rows_per_sec":(\d+)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toLong).toMap
      }
    val line = results.map { case (k, (nIn, nOut, sec, rps)) =>
      val floor = prev.get(k)
        .map(p => s""","floor_rows_per_sec":$p,"ratio":${
          math.round(p.toDouble / rps * 1000) / 1000.0}""")
        .getOrElse("")
      s""""$k":{"rows_in":$nIn,"rows_out":$nOut,"sec":$sec,""" +
        s""""rows_per_sec":$rps$floor}"""
    }.mkString("{", ",", "}")
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("STREAMBENCH_LOCAL.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
