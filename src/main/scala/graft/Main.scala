package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.algo.{AaAr, AaSmurf}
import graft.ops.{Features, Windows}
import graft.streaming.StreamOps

/** User-facing CLI — the parity surface for the reference's runnable
  * programs (`/root/reference/AA-AR.py:270-287` and
  * `/root/reference/AA-Smurf.py:184-191` argparse): point it at the same
  * input files, get the same result tables (as parquet — the reference's
  * PNGs are presentations of exactly these tables, SURVEY S6).
  *
  * Flags mirror the reference's names:
  *   aa-ar    --f edges.csv  --o outdir  --w windowSize  --s sketchNum
  *            --b backtrackWindows  --a attentionFigures  --c attentionAccounts
  *   aa-smurf --f matrix.txt --o outdir  --i maxIter
  *
  * Master defaults to local[*]; set SPARK_MASTER / SPARK_GRAFT_CPUS to
  * override (a cluster deployment passes its own master URL).
  */
object Main {
  private val usage =
    """usage:
      |  graft.Main aa-ar    --f <edges.csv>  [--o <outdir>] [--w 14] [--s 256] [--b 4] [--a 3] [--c 3]
      |  graft.Main aa-smurf --f <matrix.txt> [--o <outdir>] [--i <maxIter>]
      |  graft.Main stream   --f <eventsDir>  [--o <outdir>] [--w "1 hour"] [--m "2 hours"]
      |  graft.Main stream-dedup --f <docsDir> [--o <outdir>] [--m "1 hour"]
      |  graft.Main stream-neardup --f <docsDir> [--o <outdir>] [--m "1 hour"] [--k 8] [--b 4]
      |  graft.Main stream-asof --f <dir with points/ updates/> [--o <outdir>] [--m "1 hour"]
      |  graft.Main stream-interval --f <dir with points/ intervals/> [--o <outdir>] [--m "1 hour"] [--x 86400] [--g 3600]
      |  graft.Main stream-overlap --f <dir with left/ right/> [--o <outdir>] [--m "1 hour"] [--x 86400] [--g 3600]
      |  graft.Main stream-snapshot --f <dir with events/> [--o <outdir>]
      |  graft.Main stream-changelog --f <dir with changelog/> [--o <outdir>]
      |  graft.Main stream-cdcextract --f <dir with snap_a/ + snap_b/> [--o <outdir>] [--h <horizonMs>]
      |  graft.Main stream-sessions --f <dir with events/> [--o <outdir>] [--g "30 minutes"] [--m "2 hours"]
      |  graft.Main curate   --f <docs.parquet> [--o <outdir>] [--l 512] [--t 2000]
      |                      [--e <benchmark.parquet>] [--v <embeddings.parquet>]
      |                      [--r <spanTokens>] [--p true] [--c true] [--x true]
      |                      [--d <nearDupMaxDf, 0=ungated>]
      |  graft.Main profile  --f <docs.parquet> [--o <outdir>]
      |  graft.Main zorder   --f <table.parquet> --a <colA> --b <colB> [--o <outdir>] [--n <files>]
      |  graft.Main stats    --f <table.parquet> [--c col1,col2,...] [--o <outdir>]
      |  graft.Main compact  --f <partitioned table dir> --p <partCol> --k <keyCol> [--t <targetBytes>]
      |  graft.Main vlog     --f <table> --x init|upsert|append|delete|delete-mor|purge-mor|optimize|read|changes|vacuum
      |                      [--d <data.parquet>] [--k <keyCol>] [--p <partCol>] [--s col1,col2 (stats)]
      |                      [--z col1,col2 (optimize zorder)] [--v <version>] [--a <fromV>] [--b <toV>]
      |                      [--c col1,col2 (changes payload)] [--r <retainVersions>] [--o <outdir>]
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val opts = args.tail.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    def opt(k: String, dflt: String) = opts.getOrElse(k, dflt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        if (cpus == "*") "32" else cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args.head match {
        case "aa-ar" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val (nChanges, nRouted) = runAaAr(spark, in, opt("--o", "results"),
            windowSize = opt("--w", "14").toInt,
            sketchNum = opt("--s", "256").toInt,
            backWs = opt("--b", "4").toInt,
            numFigures = opt("--a", "3").toInt,
            numAccounts = opt("--c", "3").toInt)
          println(s"AA-AR: $nChanges change-score windows, " +
            s"$nRouted attended accounts -> ${opt("--o", "results")}")
        case "aa-smurf" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runAaSmurf(spark, in, opt("--o", "results"),
            maxIter = opts.get("--i").map(_.toInt))
          println(s"AA-Smurf: $n positions -> ${opt("--o", "results")}")
        case "stream" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStream(spark, in, opt("--o", "results"),
            size = opt("--w", "1 hour"), watermark = opt("--m", "2 hours"))
          println(s"stream: $n finalized window rows -> " +
            s"${opt("--o", "results")}/stream_counts")
        case "stream-dedup" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamDedup(spark, in, opt("--o", "results"),
            watermark = opt("--m", "1 hour"))
          println(s"stream-dedup: $n unique docs -> " +
            s"${opt("--o", "results")}/stream_unique")
        case "stream-neardup" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamNearDup(spark, in, opt("--o", "results"),
            watermark = opt("--m", "1 hour"),
            k = opt("--k", "8").toInt, bands = opt("--b", "4").toInt)
          println(s"stream-neardup: $n near-dup candidate pairs -> " +
            s"${opt("--o", "results")}/stream_neardup")
        case "stream-asof" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamAsof(spark, in, opt("--o", "results"),
            watermark = opt("--m", "1 hour"))
          println(s"stream-asof: $n matched points -> " +
            s"${opt("--o", "results")}/stream_asof")
        case "stream-interval" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamInterval(spark, in, opt("--o", "results"),
            watermark = opt("--m", "1 hour"),
            maxIntervalSeconds = opt("--x", "86400").toLong,
            bucketSeconds = opt("--g", "3600").toLong)
          println(s"stream-interval: $n covered points -> " +
            s"${opt("--o", "results")}/stream_interval")
        case "stream-overlap" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamOverlap(spark, in, opt("--o", "results"),
            watermark = opt("--m", "1 hour"),
            maxIntervalSeconds = opt("--x", "86400").toLong,
            bucketSeconds = opt("--g", "3600").toLong)
          println(s"stream-overlap: $n overlapping pairs -> " +
            s"${opt("--o", "results")}/stream_overlap")
        case "stream-snapshot" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamSnapshot(spark, in, opt("--o", "results"))
          println(s"stream-snapshot: $n upsert changelog rows -> " +
            s"${opt("--o", "results")}/stream_snapshot")
        case "stream-changelog" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamChangelog(spark, in, opt("--o", "results"))
          println(s"stream-changelog: $n apply rows -> " +
            s"${opt("--o", "results")}/stream_changelog")
        case "stream-cdcextract" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamCdcExtract(spark, in, opt("--o", "results"),
            horizonMs = opt("--h", "600000").toLong)
          println(s"stream-cdcextract: $n I/U/D rows -> " +
            s"${opt("--o", "results")}/stream_cdc_extract")
        case "stream-sessions" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runStreamSessions(spark, in, opt("--o", "results"),
            gap = opt("--g", "30 minutes"),
            watermark = opt("--m", "2 hours"))
          println(s"stream-sessions: $n finalized sessions -> " +
            s"${opt("--o", "results")}/stream_sessions")
        case "curate" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val spanWin = opt("--r", "0").toInt
          val dropTail = opt("--p", "false").toBoolean
          val useClf = opt("--c", "false").toBoolean
          val useMix = opt("--x", "false").toBoolean
          val counts = runCurate(spark, in, opt("--o", "results"),
            seqLen = opt("--l", "512").toInt,
            tokenBudget = opt("--t", "2000").toLong,
            benchPath = opts.get("--e"),
            embPath = opts.get("--v"),
            spanWin = spanWin,
            dropPplTail = dropTail,
            clfGate = useClf,
            mixEpoch = useMix,
            nearDupMaxDf = opt("--d", "50").toInt)
          val stages = Seq(
            Some(s"${counts("input")} docs in"),
            Some(s"${counts("pii_docs")} PII-bearing after exact dedup"),
            Some(s"${counts("after_gopher")} after gopher filter"),
            if (useClf)
              Some(s"${counts("after_classifier")} after distilled classifier")
            else None,
            opts.get("--e").map(_ =>
              s"${counts("after_decontam")} after decontamination"),
            Some(s"${counts("after_dedup")} after near-dup"),
            opts.get("--v").map(_ =>
              s"${counts("after_semdedup")} after semantic dedup"),
            if (spanWin > 0)
              Some(s"${counts("after_span_dedup")} after span removal")
            else None,
            if (dropTail)
              Some(s"${counts("after_ppl_filter")} after perplexity tail drop")
            else None,
            Some(s"${counts("selected")} selected"),
            Some(s"${counts("sequences")} packed sequences"),
            if (useMix)
              Some(s"${counts("mixture_rows")} mixture-epoch manifest rows")
            else None).flatten
          println(s"curate: ${stages.mkString(", ")} -> " +
            s"${opt("--o", "results")}")
        case "profile" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val counts = runProfile(spark, in, opt("--o", "results"))
          println(s"profile: ${counts("sources")} sources, " +
            s"${counts("heavy_hitters")} heavy hitters of " +
            s"${counts("vocab")} candidate words, " +
            s"${counts("quantiles")} length quantiles -> " +
            opt("--o", "results"))
        case "zorder" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val a = opts.getOrElse("--a",
            { System.err.println(usage); sys.exit(2); "" })
          val b = opts.getOrElse("--b",
            { System.err.println(usage); sys.exit(2); "" })
          val stats = runZorder(spark, in, a, b, opt("--o", "results"),
            opt("--n", "64").toInt)
          println(s"zorder: ${stats("rows")} rows -> ${stats("files")} " +
            s"z-clustered files at ${opt("--o", "results")} " +
            s"(tightest-box check: a median file spans " +
            s"${stats("median_span_a")}/${stats("domain_a")} of a, " +
            s"${stats("median_span_b")}/${stats("domain_b")} of b)")
        case "stats" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val colsArg = opts.get("--c").map(_.split(",").toSeq)
          val n = runStats(spark, in, colsArg, opt("--o", "results"))
          println(s"stats: $n column profiles -> ${opt("--o", "results")}")
        case "compact" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val partCol = opts.getOrElse("--p",
            { System.err.println(usage); sys.exit(2); "" })
          val keyCol = opts.getOrElse("--k",
            { System.err.println(usage); sys.exit(2); "" })
          val target = opt("--t", (128L << 20).toString).toLong
          val (touched, total, before) =
            runCompact(spark, in, partCol, keyCol, target)
          println(s"compact: $touched/$total partitions " +
            s"compacted ($before files before, target $target B/file)")
        case "vlog" =>
          val tbl = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val op = opts.getOrElse("--x",
            { System.err.println(usage); sys.exit(2); "" })
          println(runVlog(spark, op, tbl, opts))
        case other =>
          System.err.println(s"unknown command: $other\n$usage")
          sys.exit(2)
      }
    } finally spark.stop()
  }

  /** aa-ar pipeline on an arbitrary session (main's happy path, and the
    * MainSpec entry — main itself owns/stops its session and exits on bad
    * flags, so tests drive this instead). Returns (change-score rows,
    * attended-account rows) after writing both tables under `out`.
    */
  def runAaAr(spark: SparkSession, in: String, out: String,
              windowSize: Int = 14, sketchNum: Int = 256, backWs: Int = 4,
              numFigures: Int = 3, numAccounts: Int = 3): (Long, Long) = {
    val edges = graft.sources.Sources.edgeCsv(spark, in)
    // same staging as SparkEntry: ONE persisted focus table feeds
    // both the sketch stage and the routing stage
    val focus = AaAr.focusScores(
      Features.accountFeaturesByWindow(
        Windows.withWindowId(edges, windowSize, windowSize / 2)),
      numTrees = 100).persist(StorageLevel.MEMORY_AND_DISK)
    val changes = AaAr.runFromFocus(focus, sketchNum = sketchNum,
      backWs = backWs, numDst = numFigures)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val routing = AaAr.attentionRouting(focus, changes,
      numFigures = numFigures, numAccounts = numAccounts)
    changes.write.mode("overwrite").parquet(s"$out/change_score")
    routing.write.mode("overwrite").parquet(s"$out/attention_routing")
    val n = (changes.count(), routing.count())
    writeAaArPngs(changes, routing, focus, out)
    focus.unpersist(); changes.unpersist()
    n
  }

  /** The reference's PNG figures (S6, `AA-AR.py:177-248`): the change-score
    * series and one 2-D figure per attended pair, rendered from the same
    * result tables the parquet sinks just wrote. Everything collected here
    * is already attention-filtered or capped: the routing table is
    * numFigures × numAccounts rows, the per-figure cloud is one (window,
    * pair)'s accounts, sampled down to `cloudCap` points — a plot has a
    * bounded pixel budget no matter the corpus size.
    */
  private def writeAaArPngs(changes: org.apache.spark.sql.DataFrame,
                            routing: org.apache.spark.sql.DataFrame,
                            focus: org.apache.spark.sql.DataFrame,
                            out: String, cloudCap: Int = 100000): Unit = {
    import graft.sinks.Plots
    val series = changes.select(col("wid"), col("change_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    if (series.nonEmpty)
      Plots.linePlot(series, "Change Score", "Timestamp", "Change Score",
        new java.io.File(s"$out/change_score.png"))

    val routed = routing.collect()
    val fnames = ops.Features.featureCols
    routed.groupBy(r => (r.getAs[Number]("wid").longValue,
        r.getAs[Number]("pair_id").intValue))
      .foreach { case ((wid, pid), rows) =>
        val (_, f1, f2) = AaAr.pairs(pid)
        val cloudDf = focus
          .filter(col("wid") === wid && col("pair_id") === pid)
          .select(col("x"), col("y"))
        val total = cloudDf.count()
        val cloud = (if (total > cloudCap)
            cloudDf.sample(cloudCap.toDouble / total, seed = 7L)
          else cloudDf)
          .collect().map(r => Plots.P(r.getDouble(0), r.getDouble(1))).toSeq
        if (cloud.nonEmpty) {
          // power-of-2 binned means of the RAW y values (AA-AR.py:182-185;
          // coords are log10(f+1), so raw = 10^coord), re-logged for the
          // log-log canvas
          val l2 = math.log10(2.0)
          val binned = cloud.groupBy(p => math.ceil(p.x / l2).toLong)
            .map { case (bin, ps) =>
              Plots.P(bin * l2,
                math.log10(ps.map(p => math.pow(10, p.y)).sum / ps.size))
            }.toSeq
          val attended = rows.map(r => (Plots.P(r.getAs[Double]("x"),
            r.getAs[Double]("y")),
            r.getAs[Number]("account").toString)).toSeq
          val past = rows.filter(r => !r.isNullAt(r.fieldIndex("past_x")))
            .map(r => (Plots.P(r.getAs[Double]("past_x"),
              r.getAs[Double]("past_y")),
              Plots.P(r.getAs[Double]("x"), r.getAs[Double]("y")))).toSeq
          val prank = rows.head.getAs[Number]("prank").intValue
          Plots.twodPlot(cloud, attended, past, binned,
            rows.head.getAs[Double]("fit_slope"),
            rows.head.getAs[Double]("fit_intercept"),
            s"Window $wid — ${fnames(f2)} vs ${fnames(f1)}",
            fnames(f1), fnames(f2),
            new java.io.File(s"$out/figure${prank}_pair$pid.png"))
        }
      }
  }

  /** §2.10 user-reachable streaming path: a CSV file stream of events
    * (`ts TIMESTAMP, event_type STRING, value DOUBLE`, header row) →
    * `StreamOps.windowedEventCounts` (event-time windows + watermark) →
    * append-mode parquet sink, with `Trigger.AvailableNow` so a finite
    * directory processes to completion and exits. Append semantics: only
    * windows the final watermark has PASSED are finalized — rows whose
    * windows are still open stay in checkpointed state and flush on the
    * next run over a grown directory (exactly the incremental-ingest
    * contract a deployment wants; the same command is the forever-running
    * job under the default micro-batch trigger when pointed at a live
    * directory). Returns finalized window rows written so far.
    */
  def runStream(spark: SparkSession, in: String, out: String,
                size: String = "1 hour",
                watermark: String = "2 hours"): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL(
      "ts TIMESTAMP, event_type STRING, value DOUBLE")
    val events = spark.readStream.schema(schema)
      .option("header", "true").csv(in)
    val counts = StreamOps.windowedEventCounts(events, size, watermark)
    val q = counts.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_counts")
      .option("checkpointLocation", s"$out/_stream_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a stream whose watermark never passed a window end commits zero
    // data files — reading with the known schema returns 0 rows instead
    // of failing schema inference on an empty directory
    spark.read.schema(
        "w_start TIMESTAMP, event_type STRING, n BIGINT, sum_value DOUBLE")
      .parquet(s"$out/stream_counts").count()
  }

  /** Streaming exact dedup end-to-end — the q22 operator's streaming
    * twin, user-reachable: a document CSV directory (`ts,doc_id,text`)
    * consumed as a file stream; re-deliveries of the same text (md5 key)
    * within the watermark horizon are dropped by BOUNDED state
    * (StreamOps.streamingDedup / dropDuplicatesWithinWatermark — state
    * tracks the horizon, not the stream's lifetime). Surviving docs
    * append to parquet; `Trigger.AvailableNow` drains a finite directory
    * and exits, the checkpoint carries dedup state into the next run —
    * the incremental-ingest contract of q46, kept warm as stream state.
    */
  def runStreamDedup(spark: SparkSession, in: String, out: String,
                     watermark: String = "1 hour"): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL(
      "ts TIMESTAMP, doc_id BIGINT, text STRING")
    val docs = spark.readStream.schema(schema)
      .option("header", "true").csv(in)
      .withColumn("text_hash", md5(col("text")))
    val uniq = graft.streaming.StreamOps.streamingDedup(
      docs, "text_hash", watermark)
    val q = uniq.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_unique")
      .option("checkpointLocation", s"$out/_dedup_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // an input directory with no matching files commits zero batches and
    // never creates the sink directory — that's "0 unique docs", not a
    // read error
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_unique"))) 0L
    else spark.read.schema(
        "ts TIMESTAMP, doc_id BIGINT, text STRING, text_hash STRING")
      .parquet(s"$out/stream_unique").count()
  }

  /** Streaming near-duplicate detection end-to-end — the q23 operator's
    * streaming twin, user-reachable: the same document CSV directory as
    * stream-dedup (`ts,doc_id,text`), MinHash-banded in-stream; a doc
    * landing in an LSH band bucket already claimed within the watermark
    * horizon emits a candidate pair
    * (StreamOps.streamingNearDupCandidates — bucket state is BOUNDED,
    * expired by event-time timeout). Pairs append to parquet; returns
    * the distinct (docId, dupOf) pair count. `Trigger.AvailableNow`
    * drains a finite directory and exits; the checkpoint carries bucket
    * state into the next run.
    */
  def runStreamNearDup(spark: SparkSession, in: String, out: String,
                       watermark: String = "1 hour",
                       k: Int = 8, bands: Int = 4): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL(
      "ts TIMESTAMP, doc_id BIGINT, text STRING")
    val docs = spark.readStream.schema(schema)
      .option("header", "true").csv(in)
    val cands = graft.streaming.StreamOps.streamingNearDupCandidates(
      docs, k = k, bands = bands, watermark = watermark)
    val q = cands.toDF().writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_neardup")
      .option("checkpointLocation", s"$out/_neardup_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_neardup"))) 0L
    else spark.read.schema("docId BIGINT, dupOf BIGINT, bandId INT")
      .parquet(s"$out/stream_neardup")
      .dropDuplicates("docId", "dupOf").count()
  }

  /** Streaming as-of join end-to-end — the q79 operator's streaming twin
    * ([[StreamOps.streamingAsof]]), user-reachable: two CSV directories
    * consumed as file streams, `in/points` (`key,ts`) matched against
    * `in/updates` (`key,ts,value`); each point gets the update of its key
    * current AT ITS event time (out-of-order arrivals correct within the
    * watermark horizon; per-key history pruned at the watermark — bounded
    * state). Matches append to parquet; `Trigger.AvailableNow` drains a
    * finite directory and exits, the checkpoint carries update history
    * into the next run. Returns matched-point rows written so far.
    */
  /** Streaming CDC snapshot end-to-end — the q104/q111 pairing's
    * streaming face ([[StreamOps.streamingSnapshot]]), user-reachable:
    * an `in/events` CSV directory drained as a file stream, the per-key
    * upsert changelog appended to parquet via foreachBatch (the file
    * sink is append-only; each micro-batch's winners land as one
    * changelog slab — the compacted-topic shape). Returns changelog
    * rows; the latest row per key IS the snapshot.
    */
  def runStreamSnapshot(spark: SparkSession, in: String,
                        out: String): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val ev = spark.readStream
      .schema(StructType.fromDDL("user_id BIGINT, event_id BIGINT, " +
        "ts TIMESTAMP, event_type STRING, value DOUBLE"))
      .option("header", "true").csv(s"$in/events")
    val q = StreamOps.streamingSnapshot(ev).toDF()
      .writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        df.write.mode("append").parquet(s"$out/stream_snapshot"); ()
      }
      .option("checkpointLocation", s"$out/_snapshot_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_snapshot"))) 0L
    else spark.read.schema("userId BIGINT, lastTs TIMESTAMP, " +
        "lastEventId BIGINT, lastEventType STRING, lastValue DOUBLE")
      .parquet(s"$out/stream_snapshot").count()
  }

  /** Streaming CDC changelog apply end-to-end — q139's streaming twin
    * ([[StreamOps.streamingChangelog]]), user-reachable: an
    * `in/changelog` CSV directory (op, seq, event_id, ts, user_id,
    * event_type, value) drained as a file stream, the per-key
    * upsert/tombstone apply rows appended to parquet via foreachBatch.
    * The latest row per key IS the apply: U rows carry the payload to
    * upsert, D rows tombstone the key.
    */
  def runStreamChangelog(spark: SparkSession, in: String,
                         out: String): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val cl = spark.readStream
      .schema(StructType.fromDDL("op STRING, seq BIGINT, " +
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE"))
      .option("header", "true").csv(s"$in/changelog")
    val q = StreamOps.streamingChangelog(cl).toDF()
      .writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        df.write.mode("append").parquet(s"$out/stream_changelog"); ()
      }
      .option("checkpointLocation", s"$out/_changelog_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_changelog"))) 0L
    else spark.read.schema("eventId BIGINT, op STRING, seq BIGINT, " +
        "ts TIMESTAMP, userId BIGINT, eventType STRING, value DOUBLE")
      .parquet(s"$out/stream_changelog").count()
  }

  /** Streaming CDC extract over two snapshot CSV directories — q142's
    * twin (the thirteenth) as a CLI: `<in>/snap_a` and `<in>/snap_b`
    * hold the old/new keyed snapshots; the minimal I/U/D feed lands as
    * parquet. Half-joined keys finalize once the watermark passes the
    * horizon — a finite input's maximum timestamp never advances the
    * watermark past itself, so keys only one side delivered near the
    * end may stay in state for the NEXT run (the standard append-mode
    * horizon contract; the spec-pinned path feeds a late punctuation
    * row to flush).
    */
  def runStreamCdcExtract(spark: SparkSession, in: String, out: String,
                          horizonMs: Long): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val sch = StructType.fromDDL("event_id BIGINT, ts TIMESTAMP, " +
      "user_id BIGINT, event_type STRING, value DOUBLE")
    def side(d: String) = spark.readStream.schema(sch)
      .option("header", "true").csv(s"$in/$d")
    val q = StreamOps.streamingCdcExtract(
        side("snap_a"), side("snap_b"), horizonMs).toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        df.write.mode("append").parquet(s"$out/stream_cdc_extract"); ()
      }
      .option("checkpointLocation", s"$out/_cdcx_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_cdc_extract"))) 0L
    else spark.read.schema("op STRING, eventId BIGINT, userId BIGINT, " +
        "eventType STRING, value DOUBLE")
      .parquet(s"$out/stream_cdc_extract").count()
  }

  /** In-place small-file compaction of a partitioned table (q127's
    * operator as a CLI). Returns (touched, totalPartitions, filesBefore).
    */
  def runCompact(spark: SparkSession, table: String, partCol: String,
      keyCol: String, targetBytes: Long): (Int, Int, Int) = {
    val plans = graft.ops.Compact.compactPartitions(spark, table,
      partCol, keyCol, targetBytes)
    (plans.count(_.touched), plans.size, plans.map(_.filesBefore).sum)
  }

  /** Streaming sessionization over a CSV event directory — q41's twin
    * as a CLI: finalized (watermark-closed) sessions land as parquet;
    * sessions still open when the input drains stay in state and do not
    * emit (append-mode semantics — the next run's events would extend
    * them from the checkpoint).
    */
  def runStreamSessions(spark: SparkSession, in: String, out: String,
                        gap: String, watermark: String): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val ev = spark.readStream
      .schema(StructType.fromDDL(
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE"))
      .option("header", "true").csv(s"$in/events")
    val q = StreamOps.streamingSessions(ev, gap, watermark)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_sessions")
      .option("checkpointLocation", s"$out/_sessions_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema("user_id BIGINT, session_start STRING, " +
        "n_events BIGINT, sum_value DOUBLE")
      .parquet(s"$out/stream_sessions").count()
  }

  def runStreamAsof(spark: SparkSession, in: String, out: String,
                    watermark: String = "1 hour"): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val pts = spark.readStream
      .schema(StructType.fromDDL("key BIGINT, ts TIMESTAMP"))
      .option("header", "true").csv(s"$in/points")
    val upd = spark.readStream
      .schema(StructType.fromDDL("key BIGINT, ts TIMESTAMP, value DOUBLE"))
      .option("header", "true").csv(s"$in/updates")
    val q = StreamOps.streamingAsof(pts, upd, watermark).toDF()
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_asof")
      .option("checkpointLocation", s"$out/_asof_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_asof"))) 0L
    else spark.read.schema(
        "key BIGINT, ts TIMESTAMP, asofTs BIGINT, asofValue DOUBLE")
      .parquet(s"$out/stream_asof").count()
  }

  /** Streaming interval join end-to-end — the q81 operator's streaming
    * twin ([[StreamOps.streamingIntervalJoin]]), user-reachable: two CSV
    * directories consumed as file streams, `in/points` (`pid,ts`) paired
    * with every `in/intervals` (`iid,s0,s1`) row whose closed [s0,s1]
    * covers the point's ts — a stream-stream equi join on the time bin
    * with the exact range residual, join state bounded by the
    * `maxIntervalSeconds` constraint (CLI `--x`; intervals are clamped
    * to it). Pairs append to parquet; `Trigger.AvailableNow` drains a
    * finite directory and exits. Returns covered-point pair rows.
    */
  def runStreamInterval(spark: SparkSession, in: String, out: String,
                        watermark: String = "1 hour",
                        maxIntervalSeconds: Long = 86400L,
                        bucketSeconds: Long = 3600L): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val pts = spark.readStream
      .schema(StructType.fromDDL("pid BIGINT, ts TIMESTAMP"))
      .option("header", "true").csv(s"$in/points")
    val ivs = spark.readStream
      .schema(StructType.fromDDL("iid BIGINT, s0 TIMESTAMP, s1 TIMESTAMP"))
      .option("header", "true").csv(s"$in/intervals")
    val q = StreamOps.streamingIntervalJoin(pts, "ts", ivs, "s0", "s1",
        maxIntervalSeconds = maxIntervalSeconds,
        bucketSeconds = bucketSeconds, watermark = watermark)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_interval")
      .option("checkpointLocation", s"$out/_interval_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_interval"))) 0L
    else spark.read.schema(
        "pid BIGINT, ts TIMESTAMP, iid BIGINT, s0 TIMESTAMP, s1 TIMESTAMP")
      .parquet(s"$out/stream_interval").count()
  }

  /** Streaming overlap join end-to-end: `in/left` and `in/right` CSV
    * directories (`id,s0,s1` header rows, one interval each) → bucketed
    * stream-stream overlap join → parquet, checkpointed,
    * `Trigger.AvailableNow` (the [[runStreamInterval]] contract for the
    * two-sided op).
    */
  def runStreamOverlap(spark: SparkSession, in: String, out: String,
                       watermark: String = "1 hour",
                       maxIntervalSeconds: Long = 86400L,
                       bucketSeconds: Long = 3600L): Long = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val l = spark.readStream
      .schema(StructType.fromDDL("lid BIGINT, l0 TIMESTAMP, l1 TIMESTAMP"))
      .option("header", "true").csv(s"$in/left")
    val r = spark.readStream
      .schema(StructType.fromDDL("rid BIGINT, r0 TIMESTAMP, r1 TIMESTAMP"))
      .option("header", "true").csv(s"$in/right")
    val q = StreamOps.streamingOverlapJoin(l, "l0", "l1", r, "r0", "r1",
        maxIntervalSeconds = maxIntervalSeconds,
        bucketSeconds = bucketSeconds, watermark = watermark)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/stream_overlap")
      .option("checkpointLocation", s"$out/_overlap_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/stream_overlap"))) 0L
    else spark.read.schema("lid BIGINT, l0 TIMESTAMP, l1 TIMESTAMP, " +
        "rid BIGINT, r0 TIMESTAMP, r1 TIMESTAMP")
      .parquet(s"$out/stream_overlap").count()
  }

  /** The LLM-training-data curation pipeline end-to-end, user-reachable:
    * documents parquet (`doc_id, text`) → exact dedup → PII scrub →
    * Gopher composite quality filter → (optional) benchmark
    * decontamination → near-dup clustering (3-gram Jaccard + connected
    * components) keeping the best-quality representative per cluster →
    * (optional) semantic dedup over an embeddings table → language ID +
    * quality scoring → per-language token-budget selection →
    * concat-and-chunk packing into `seqLen`-token training sequences.
    * Writes parquet tables under `out` (`clusters`, `pii_stats`,
    * `kept_docs`, `selected`, `packed`) and returns per-stage counts.
    * Every stage is the same operator the named queries check against
    * DuckDB (q22, q72, q74, q64, q43/q60, q69, q61, q63) — this is
    * their composition, not a parallel implementation.
    *
    * `benchPath` (CLI `--e`): held-out eval split (`doc_id, text`);
    * training docs sharing any 5-gram with it are dropped (q64).
    * `embPath` (CLI `--v`): embeddings table (`vec_id, embedding`)
    * keyed by doc_id; SemDeDup prunes semantic near-dups (q69) with a
    * corpus-derived cell count. Docs with no embedding row pass through.
    * `spanWin` (CLI `--r`, 0 = off): duplicate-span REMOVAL (q76) —
    * survivors are rewritten without later copies of any
    * `spanWin`-token tile, so packing never spends budget on
    * boilerplate. `dropPplTail` (CLI `--p true`): CCNet-style
    * perplexity bucketing (q77) drops the worst-scoring third.
    * `clfGate` (CLI `--c true`): distilled-classifier quality gate
    * (q85) — an IRLS logistic student of the q18 teacher rule scores
    * every doc map-only and low-quality predictions drop.
    * `mixEpoch` (CLI `--x true`): materialize a per-LANGUAGE
    * training-mixture epoch over the selection (q88,
    * `Sampling.mixtureEpoch` with lang_pred as the mixture group) —
    * the manifest (doc_id, copy, md5 shuffle-order key) lands as
    * `mixture`, balancing languages toward a uniform token share with
    * capped upsampling.
    */
  def runCurate(spark: SparkSession, in: String, out: String,
                seqLen: Int = 512, tokenBudget: Long = 2000L,
                benchPath: Option[String] = None,
                embPath: Option[String] = None,
                semMinCos: Double = 0.95,
                spanWin: Int = 0,
                dropPplTail: Boolean = false,
                clfGate: Boolean = false,
                mixEpoch: Boolean = false,
                nearDupMaxDf: Int = 50): Map[String, Long] = {
    import graft.ext.{Dedup, SimSearch, TextOps}
    val docs = spark.read.parquet(in)
      .select(col("doc_id"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nIn = docs.count()

    // exact dedup first (hash-group, cheapest): keep each byte-identical
    // group's canonical (smallest) doc_id.
    val exactRaw = docs.join(
      Dedup.exact(docs).select(col("canonical_doc_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    // … then PII scrubbing (TextOps.piiScrub — the q72 operator), so
    // every later stage (clustering, quality, lang-ID, token counts,
    // packing) sees clean text only. Scrubbing after exact dedup keeps
    // the byte-identical grouping cheap; scrubbing before near-dup
    // clustering means masked variants of the same doc still cluster.
    // Persisted — it feeds the pii_stats sink and the working text.
    val scrub = TextOps.piiScrub(exactRaw)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // counted AFTER exact dedup: PII occurrences inside dropped exact
    // duplicates are not in this number (the CLI summary says so)
    val nPii = scrub.filter(col("n_emails") + col("n_ipv4") +
      col("n_phones") > 0).count()
    val exact = scrub.select(col("doc_id"), col("clean_text").as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Gopher composite quality gate (q74) on the scrubbed text: cheap
    // per-doc repetition/length/stopword rules drop degenerate docs
    // BEFORE any pairwise or clustering stage pays for them.
    val gophered = exact.join(
      TextOps.gopherFilter(exact).filter(col("pass"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nGopher = gophered.count()

    // distilled-classifier quality gate (q85 — ml.LogReg) when
    // requested: the q18 teacher rule labels the corpus, an IRLS
    // logistic student distills it onto three cheap ratios, and the
    // STUDENT's verdict gates. At this corpus the teacher is cheap and
    // the stage is demonstrative; the shape is the one that scales when
    // the teacher is an expensive labeler run on a sample — training
    // stays `iters` aggregation passes and scoring stays map-only.
    val clfed = if (!clfGate) gophered else {
      val feats = TextOps.distillFeatures(gophered)
      val w = graft.ml.LogReg.fitIrls(
        feats, TextOps.distillFeatCols, "is_hq")
      gophered.join(
        feats.filter(graft.ml.LogReg.logit(w, TextOps.distillFeatCols) > 0)
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val nClf = if (clfGate) clfed.count() else nGopher

    // benchmark decontamination (q64): drop any training doc sharing a
    // 5-gram with the held-out eval split, so the selection can't leak
    // eval data into training sequences.
    val decon = benchPath.fold(clfed) { bp =>
      val bench = spark.read.parquet(bp)
        .select(col("doc_id"), col("text"))
      clfed.join(
        TextOps.contaminationOverlap(clfed, bench)
          .filter(!col("contaminated")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val nDecon = if (benchPath.isDefined) decon.count() else nClf

    // … then near-dup clusters over the survivors; keep the best-quality
    // representative of each cluster (Dedup.clusterRepresentatives —
    // the exact operator q60 hash-checks)
    // df-gated by default (TextScale's proven corpus-scale shape): the
    // ungated inverted-index self-join is Σ df² — one boilerplate shingle
    // shared by 10k docs alone costs 10⁸ candidate pairs — while the gate
    // bounds it at Σ min(df, maxDf)². A shingle above the gate is by
    // definition corpus-boilerplate: the pairs it would add are either
    // already found via the pair's OTHER (rarer) shared shingles or are
    // boilerplate-only overlaps near-dup should not merge on anyway.
    // `nearDupMaxDf = 0` restores the exact ungated join for small corpora.
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(decon, n = 3, minJaccard = 0.05,
          maxDf = nearDupMaxDf)
        .select(col("doc_a"), col("doc_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qual = TextOps.qualityScore(decon)
      .select(col("doc_id"), round(col("quality_score"), 6).as("q"))
    val reps = Dedup.clusterRepresentatives(clusters, qual)
      .select(col("rep_doc_id").as("keep_id"))
    val dropped = clusters.join(reps,
        clusters("doc_id") === col("keep_id"), "left_anti")
      .select(col("doc_id"))
    val kept0 = decon.join(dropped, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNear = kept0.count()

    // semantic dedup (q69 — SemDeDup) when an embeddings table rides
    // along: prune docs whose embedding a same-cell semantic near-dup
    // dominates; the cell count derives from the corpus size
    // (SimSearch.deriveNlist), so the stage stays n²/nlist at scale.
    val kept = embPath.fold(kept0) { ep =>
      val emb = spark.read.parquet(ep)
      val centers = SimSearch.ivfCentroids(emb)
      val pruned = Dedup.semDedup(emb, centers, minCos = semMinCos)
        .filter(!col("keep")).select(col("vec_id").as("doc_id"))
      kept0.join(pruned, Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val nKept = if (embPath.isDefined) kept.count() else nNear

    // duplicate-span removal (q76) when requested: rewrite the
    // survivors dropping every later corpus-wide copy of a
    // `spanWin`-token tile; a doc whose every tile was seen earlier
    // vanishes entirely. Downstream token counts and packing see the
    // REWRITTEN text, so the budget isn't spent on boilerplate.
    val spanned = if (spanWin <= 0) kept else
      Dedup.removeDuplicateSpans(kept, winTokens = spanWin)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("text_deduped").as("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nSpan = if (spanWin <= 0) nKept else spanned.count()

    // CCNet-style tail drop (q77) when requested: rank what's left by
    // unigram cross-entropy and drop the worst-scoring bucket before
    // any token budget is spent on it.
    val plFiltered = if (!dropPplTail) spanned else
      spanned.join(TextOps.perplexityBuckets(spanned)
          .filter(col("ppl_bucket") =!= "tail").select(col("doc_id")),
        Seq("doc_id"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nPpl = if (!dropPplTail) nSpan else plFiltered.count()

    // language + quality + token counts → per-language budget
    // (TextOps.tokenBudgetFilter — the exact operator q61 hash-checks)
    val lang = TextOps.langId(plFiltered)
    val toks = TextOps.qualityFeatures(plFiltered)
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"))
    val cur = lang.join(qual, "doc_id").join(toks, "doc_id")
    val selected = TextOps.tokenBudgetFilter(cur, tokenBudget)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSel = selected.count()

    // pack the selection into fixed-length training sequences (q63)
    val packed = TextOps.packSequences(
      selected.select(col("lang_pred"), col("doc_id"), col("n_tokens")),
      seqLen = seqLen)

    clusters.write.mode("overwrite").parquet(s"$out/clusters")
    scrub.select(col("doc_id"), col("n_emails"), col("n_ipv4"),
      col("n_phones")).write.mode("overwrite").parquet(s"$out/pii_stats")
    plFiltered.select(col("doc_id")).write.mode("overwrite")
      .parquet(s"$out/kept_docs")
    selected.write.mode("overwrite").parquet(s"$out/selected")
    packed.write.mode("overwrite").parquet(s"$out/packed")
    // optional per-language mixture epoch over the selection (q88):
    // lang_pred stands in for the source grouping — balance languages
    // toward a uniform token share with capped upsampling
    val nMix = if (!mixEpoch) 0L else {
      val manifest = graft.ops.Sampling.mixtureEpoch(
        selected.select(col("doc_id"),
          col("lang_pred").as("source"), col("n_tokens")))
      manifest.write.mode("overwrite").parquet(s"$out/mixture")
      spark.read.parquet(s"$out/mixture").count()
    }
    val nSeq = spark.read.parquet(s"$out/packed")
      .agg(countDistinct(col("lang_pred"), col("seq_id"))).head().getLong(0)
    docs.unpersist(); scrub.unpersist(); exact.unpersist()
    gophered.unpersist(); clusters.unpersist(); kept0.unpersist()
    if (clfGate) clfed.unpersist()
    if (benchPath.isDefined) decon.unpersist()
    if (embPath.isDefined) kept.unpersist()
    if (spanWin > 0) spanned.unpersist()
    if (dropPplTail) plFiltered.unpersist()
    selected.unpersist()
    Map("input" -> nIn, "pii_docs" -> nPii, "after_gopher" -> nGopher,
      "after_classifier" -> nClf,
      "after_decontam" -> nDecon, "after_dedup" -> nNear,
      "after_semdedup" -> nKept, "after_span_dedup" -> nSpan,
      "after_ppl_filter" -> nPpl,
      "selected" -> nSel, "sequences" -> nSeq, "mixture_rows" -> nMix)
  }

  /** aa-smurf pipeline on an arbitrary session; returns the number of
    * reordered positions after writing the table under `out`.
    */
  def runAaSmurf(spark: SparkSession, in: String, out: String,
                 maxIter: Option[Int] = None,
                 spyCap: Long = 10000): Long = {
    val edges = graft.sources.Sources.denseMatrix(spark, in)
    val order = AaSmurf.run(spark, edges, minCount = 3, maxIter = maxIter)
    order.write.mode("overwrite").parquet(s"$out/smurf_order")
    val n = order.count()
    // S6 spy figure (AA-Smurf.py:168-178): a raster of the FULL matrix is
    // only renderable (and only legible) for matrices up to ~spyCap nodes
    // — the reference materializes the dense n×n picture, which caps it
    // identically. Above the cap the parquet order table is the output.
    if (n > 0 && n <= spyCap) {
      val posOf = order.select(col("node"), col("pos")).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val idxOf = posOf.keys.toSeq.sorted.zipWithIndex.toMap
      val cells = graft.ops.GraphOps.binaryEdges(edges)
        .select(col("src"), col("dst")).collect()
        .flatMap { r =>
          val (s, d) = (r.getLong(0), r.getLong(1))
          if (idxOf.contains(s) && idxOf.contains(d))
            Some((idxOf(s), idxOf(d))) else None
        }.toSeq
      val nodes = posOf.keys.toSeq.sorted
      graft.sinks.Plots.spyPair(posOf.size, cells,
        i => posOf(nodes(i)), new java.io.File(s"$out/reorder.png"))
    }
    n
  }

  /** `stats`: the q106 table-stats profile over an arbitrary parquet —
    * per-column row/null/distinct counts and min/max (computed on the
    * native type, emitted as strings) from ONE aggregation pass. The
    * multi-count-distinct costs one Expand (each row replicated once
    * per profiled column) — a deliberate single-scan-vs-replication
    * trade; profile a column subset via `--c` on very wide tables.
    */
  def runStats(spark: SparkSession, in: String,
               colsOpt: Option[Seq[String]], out: String): Long = {
    val df = spark.read.parquet(in)
    val cols = colsOpt.getOrElse(df.columns.toSeq)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = cols.map(c =>
      struct(lit(c).as("column"), col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val")))
    wide.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/table_stats")
    spark.read.parquet(s"$out/table_stats").count()
  }

  /** `zorder`: rewrite a parquet table z-clustered on two integer-ish
    * columns (q100's operator as a CLI stage — the layout-maintenance
    * job a lakehouse runs to keep multi-dimensional skipping tight).
    * Emits the rewritten files plus the per-file min/max stats table a
    * table format would index, and returns span diagnostics (how tight
    * the median file's box is on each dimension).
    */
  def runZorder(spark: SparkSession, in: String, a: String, b: String,
                out: String, nFiles: Int): Map[String, Long] = {
    import graft.ops.Layout
    Layout.zOrderWrite(spark.read.parquet(in), a, b, s"$out/zorder",
      nFiles)
    val stats = Layout.fileStats(spark, s"$out/zorder", a, b)
      .persist(StorageLevel.MEMORY_AND_DISK)
    stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$out/zorder_file_stats")
    val agg = stats.agg(
      sum(col("rows")).as("rows"), count(lit(1)).as("files"),
      expr("percentile_approx(max_a - min_a, 0.5)").as("sa"),
      expr("percentile_approx(max_b - min_b, 0.5)").as("sb"),
      (max(col("max_a")) - min(col("min_a"))).as("da"),
      (max(col("max_b")) - min(col("min_b"))).as("db")).collect()(0)
    stats.unpersist()
    Map("rows" -> agg.getAs[Long]("rows"),
      "files" -> agg.getAs[Long]("files"),
      "median_span_a" -> agg.getAs[Number]("sa").longValue(),
      "median_span_b" -> agg.getAs[Number]("sb").longValue(),
      "domain_a" -> agg.getAs[Number]("da").longValue(),
      "domain_b" -> agg.getAs[Number]("db").longValue())
  }

  /** `profile`: sketch-based corpus profile (the q93/q94/q98 operators
    * as a CLI stage) — per-source HyperLogLog distinct-word estimates
    * next to their exact verification counts (`profile_distinct`),
    * Count-Min heavy hitters over the whole corpus (`profile_heavy`),
    * and dyadic-CM token-count quantiles (`profile_quantiles` — the
    * length-distribution shape: p25/p50/p75/p90/p99 of tokens per doc
    * from the ≤4352-cell grid). At 100 TB the exact columns would be
    * dropped and the register/grid tables carried between days (all
    * three merge: max for registers, + for grid cells).
    */
  def runProfile(spark: SparkSession, in: String,
                 out: String): Map[String, Long] = {
    import graft.ext.Sketches
    val docs = spark.read.parquet(in)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val words = docs
      .select(col("source"), explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hll = Sketches.hllDistinct(words, col("word"), Seq(col("source")))
      .withColumnRenamed("g0", "source")
    hll.coalesce(1).write.mode("overwrite")
      .parquet(s"$out/profile_distinct")
    val hh = Sketches.cmHeavyHitters(words.select(col("word")), "word")
    hh.coalesce(1).write.mode("overwrite").parquet(s"$out/profile_heavy")
    val qs = Sketches.dyadicCmQuantiles(
      docs.select(size(split(lower(col("text")), "\\s+"))
        .as("n_tokens")), "n_tokens")
    qs.coalesce(1).write.mode("overwrite")
      .parquet(s"$out/profile_quantiles")
    val nSources = spark.read.parquet(s"$out/profile_distinct").count()
    val heavy = spark.read.parquet(s"$out/profile_heavy")
    val nVocab = heavy.count()
    val nHeavy = heavy.filter(col("is_heavy")).count()
    val nQuant = spark.read.parquet(s"$out/profile_quantiles").count()
    words.unpersist(); docs.unpersist()
    Map("sources" -> nSources, "vocab" -> nVocab,
      "heavy_hitters" -> nHeavy, "quantiles" -> nQuant)
  }

  /** The versioned-table CLI (`vlog` mode): every TxLog commit kind plus
    * reads, change feeds, and vacuum, over an on-disk table directory.
    * Returns the human-readable summary line `main` prints.
    */
  def runVlog(spark: SparkSession, op: String, table: String,
      opts: Map[String, String]): String = {
    import graft.ops.TxLog
    def opt(k: String, d: String) = opts.getOrElse(k, d)
    def req(k: String) = opts.getOrElse(k,
      throw new IllegalArgumentException(s"vlog $op needs $k"))
    def cols(k: String): Seq[String] =
      opts.get(k).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    def data() = spark.read.parquet(req("--d"))
    op match {
      case "init" =>
        val v = TxLog.commitInitial(spark, table, data(), req("--p"),
          statsCols = cols("--s"))
        s"vlog: initial snapshot committed as v$v"
      case "upsert" =>
        val v = TxLog.commitUpsert(spark, table, data(), req("--k"),
          req("--p"), statsCols = cols("--s"))
        s"vlog: upsert committed as v$v"
      case "append" =>
        val v = TxLog.commitAppend(spark, table, data(), req("--p"),
          statsCols = cols("--s"))
        s"vlog: blind append committed as v$v"
      case "delete" =>
        val v = TxLog.commitDelete(spark, table, data(), req("--k"),
          req("--p"), statsCols = cols("--s"))
        s"vlog: delete committed as v$v"
      case "delete-mor" =>
        val v = TxLog.commitDeleteMor(spark, table, data(), req("--k"))
        s"vlog: merge-on-read delete committed as v$v (zero base writes)"
      case "purge-mor" =>
        val v = TxLog.commitPurgeMor(spark, table, req("--p"),
          statsCols = cols("--s"))
        s"vlog: delete files folded as v$v"
      case "optimize" =>
        val v = TxLog.commitOptimize(spark, table, req("--p"),
          zorder = cols("--z"), statsCols = cols("--s"))
        s"vlog: optimize committed as v$v " +
          s"(${TxLog.filesOf(table, v).size} files)"
      case "read" =>
        val v = opt("--v", TxLog.currentVersion(table).toString).toInt
        val out = opt("--o", "results")
        val df = TxLog.readVersion(spark, table, v)
        df.write.mode("overwrite").parquet(s"$out/v$v")
        s"vlog: v$v (${df.count()} rows) -> $out/v$v"
      case "changes" =>
        val from = req("--a").toInt
        val to = opt("--b", TxLog.currentVersion(table).toString).toInt
        val out = opt("--o", "results")
        val df = TxLog.tableChanges(spark, table, from, to, req("--k"),
          cols("--c"))
        df.write.mode("overwrite").parquet(s"$out/changes_v${from}_v$to")
        s"vlog: ${df.count()} changes v$from -> v$to at " +
          s"$out/changes_v${from}_v$to"
      case "vacuum" =>
        val (files, manifests) = TxLog.vacuum(spark, table,
          opt("--r", "1").toInt)
        s"vlog: vacuum removed $files data files, $manifests manifests"
      case other =>
        throw new IllegalArgumentException(s"unknown vlog op: $other")
    }
  }
}
