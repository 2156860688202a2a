package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end CLI parity (SURVEY §3 / VERDICT "user-facing entry point"):
  * a user's first touch is `graft.Main aa-ar --f edges.csv` — drive the
  * same pipelines Main dispatches to, from the same reference-format
  * inputs (a written-out edge CSV; the reference's own sample matrix),
  * and check result tables land as readable parquet.
  *
  * main() itself owns its SparkSession (and stops it) — specs call the
  * extracted runAaAr/runAaSmurf with the shared test session instead.
  */
class MainSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("aa-ar CLI pipeline runs from a reference-format edge CSV") {
    val tmp = Files.createTempDirectory("graft-main").toString
    // reference input format (AA-AR.py:286-287): header + 4 int columns
    model.Tables.edges(spark, sfDir)
      .select(col("src").as("Source"), col("dst").as("Destination"),
        col("weight").as("Weight"), col("ts").as("Timestamp"))
      .coalesce(1)
      .write.option("header", "true").csv(s"$tmp/edges_csv")
    val (nChanges, nRouted) = Main.runAaAr(spark, s"$tmp/edges_csv",
      s"$tmp/out", windowSize = 28, sketchNum = 32, backWs = 4,
      numFigures = 3, numAccounts = 3)
    assert(nChanges > 0)
    assert(nRouted > 0)
    val changes = spark.read.parquet(s"$tmp/out/change_score")
    assert(changes.count() == nChanges)
    assert(changes.columns.contains("wid"))
    val routing = spark.read.parquet(s"$tmp/out/attention_routing")
    assert(routing.count() == nRouted)
    // per-figure power-law overlay columns are part of the contract
    Seq("fit_slope", "fit_intercept", "fit_r2")
      .foreach(c => assert(routing.columns.contains(c)))
    // S6 PNG sinks: the change-score series and one figure per attended
    // (wid, pair); every PNG must decode to a non-trivial raster
    val pngs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".png"))
    assert(pngs.exists(_.getName == "change_score.png"))
    assert(pngs.exists(_.getName.startsWith("figure")))
    pngs.foreach { f =>
      val img = javax.imageio.ImageIO.read(f)
      assert(img != null && img.getWidth > 100 && img.getHeight > 100,
        s"unreadable png ${f.getName}")
    }
  }

  test("stream CLI mode: file source → windowed counts → parquet sink") {
    val tmp = Files.createTempDirectory("graft-main").toString
    // a finite CSV "directory stream": 10 hours of events — the final
    // watermark (max ts − 2h) passes the first ~8 hourly windows, so
    // append mode finalizes them; the open tail stays in state
    val rows = (0 until 600).map { i =>
      val ts = java.time.Instant.ofEpochSecond(1700000000L + i * 60L)
      s"$ts,type${i % 3},${i % 7}.0"
    }
    val csvDir = new java.io.File(s"$tmp/events_csv")
    csvDir.mkdirs()
    val w = new java.io.PrintWriter(s"$csvDir/part-0.csv")
    w.println("ts,event_type,value"); rows.foreach(w.println); w.close()

    val n = Main.runStream(spark, csvDir.toString, s"$tmp/out",
      size = "1 hour", watermark = "2 hours")
    assert(n > 0, "no finalized windows written")
    val out = spark.read.parquet(s"$tmp/out/stream_counts")
    assert(out.count() == n)
    Seq("w_start", "event_type", "n", "sum_value")
      .foreach(c => assert(out.columns.contains(c)))
    // 3 event types per finalized hourly window; hourly totals match the
    // batch computation over the same finalized horizon
    val perWindow = out.groupBy(col("w_start"))
      .agg(count(lit(1)).as("k")).select(col("k")).distinct().collect()
    assert(perWindow.forall(_.getLong(0) == 3L))
  }

  test("stream CLI mode resumes from checkpoint: new files, no re-emits") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val csvDir = new java.io.File(s"$tmp/events_csv")
    csvDir.mkdirs()
    def writeBatch(name: String, startMin: Int, minutes: Int): Unit = {
      val w = new java.io.PrintWriter(s"$csvDir/$name.csv")
      w.println("ts,event_type,value")
      (startMin until startMin + minutes).foreach { i =>
        // hour-aligned base so every finalized window is a complete hour
        val ts = java.time.Instant.ofEpochSecond(1699999200L + i * 60L)
        w.println(s"$ts,type${i % 2},1.0")
      }
      w.close()
    }
    // batch 1: 5 hours of events → watermark (max−2h) finalizes ~3 windows
    writeBatch("part-0", 0, 300)
    val n1 = Main.runStream(spark, csvDir.toString, s"$tmp/out",
      size = "1 hour", watermark = "2 hours")
    assert(n1 > 0)
    // batch 2: 5 MORE hours appended — the second run must pick up ONLY
    // the new file (checkpointed source offsets), flush the windows the
    // advancing watermark closed, and never re-emit finalized ones
    writeBatch("part-1", 300, 300)
    val n2 = Main.runStream(spark, csvDir.toString, s"$tmp/out",
      size = "1 hour", watermark = "2 hours")
    assert(n2 > n1, s"resume did not extend output: $n1 -> $n2")
    val out = spark.read.parquet(s"$tmp/out/stream_counts")
    // no duplicate (window, type) rows across the two incremental runs
    assert(out.count() ==
      out.select(col("w_start"), col("event_type")).distinct().count())
    // counts are complete per finalized hour: 30 each of the 2 types
    val byWindow = out.groupBy(col("w_start"))
      .agg(sum(col("n")).as("total")).select(col("total"))
      .distinct().collect()
    assert(byWindow.forall(_.getLong(0) == 60L))
  }

  test("stream-dedup CLI mode drops re-delivered texts across runs") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val csvDir = new java.io.File(s"$tmp/docs_csv")
    csvDir.mkdirs()
    def write(name: String, rows: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(s"$csvDir/$name.csv")
      w.println("ts,doc_id,text"); rows.foreach(w.println); w.close()
    }
    write("a", Seq(
      "2024-01-01 01:00:00,1,alpha text",
      "2024-01-01 01:10:00,2,beta text",
      "2024-01-01 01:20:00,3,alpha text")) // within-run re-delivery
    val n1 = Main.runStreamDedup(spark, csvDir.toString, s"$tmp/out",
      watermark = "10 hours")
    assert(n1 == 2, s"expected 2 unique docs after run 1, got $n1")
    // run 2 over a grown directory: checkpointed dedup state drops the
    // cross-run re-delivery of "beta text", admits the new doc
    write("b", Seq(
      "2024-01-01 02:00:00,4,beta text",
      "2024-01-01 02:10:00,5,gamma text"))
    val n2 = Main.runStreamDedup(spark, csvDir.toString, s"$tmp/out",
      watermark = "10 hours")
    assert(n2 == 3, s"expected 3 unique docs after run 2, got $n2")
    val uniq = spark.read.parquet(s"$tmp/out/stream_unique")
    assert(uniq.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 5L))
  }

  test("stream-neardup CLI mode pairs a re-worded duplicate across runs") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val csvDir = new java.io.File(s"$tmp/docs_csv")
    csvDir.mkdirs()
    def write(name: String, rows: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(s"$csvDir/$name.csv")
      w.println("ts,doc_id,text"); rows.foreach(w.println); w.close()
    }
    // one-word rewording — the banding collision StreamOpsSpec asserts
    // against the batch operator for these exact strings
    val tA = "the quick brown fox jumps over the lazy dog near the old " +
      "river bank every sunny morning"
    val tB = "the quick brown fox jumps over the lazy dog near the old " +
      "river bank every sunny evening"
    write("a", Seq(
      s"2024-01-01 01:00:00,1,$tA",
      "2024-01-01 01:10:00,2,unrelated text about watermark state"))
    val n1 = Main.runStreamNearDup(spark, csvDir.toString, s"$tmp/out",
      watermark = "10 hours")
    assert(n1 == 0, s"expected 0 pairs after run 1, got $n1")
    // run 2: the rewording arrives — checkpointed bucket state from run 1
    // still owns doc 1's bands, so the cross-run near-dup is caught
    write("b", Seq(s"2024-01-01 02:00:00,3,$tB"))
    val n2 = Main.runStreamNearDup(spark, csvDir.toString, s"$tmp/out",
      watermark = "10 hours")
    assert(n2 == 1, s"expected 1 pair after run 2, got $n2")
    val pairs = spark.read.parquet(s"$tmp/out/stream_neardup")
    assert(pairs.select(col("docId"), col("dupOf")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((3L, 1L)))
  }

  test("stream-asof CLI mode matches points to the update current at their ts") {
    val tmp = Files.createTempDirectory("graft-main").toString
    def write(sub: String, header: String, lines: Seq[String]): Unit = {
      val d = new java.io.File(s"$tmp/in/$sub"); d.mkdirs()
      val w = new java.io.PrintWriter(s"$d/part-0.csv")
      w.println(header); lines.foreach(w.println); w.close()
    }
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    write("updates", "key,ts,value",
      Seq(s"1,${t(10)},1.0", s"1,${t(30)},2.0"))
    write("points", "key,ts",
      Seq(s"1,${t(5)}", s"1,${t(20)}", s"1,${t(40)}"))
    val n = Main.runStreamAsof(spark, s"$tmp/in", s"$tmp/out")
    assert(n == 3, s"expected every point emitted, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_asof")
      .collect().map(r => r.getTimestamp(1).toInstant.toString ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(t(5)) == None)        // before any update
    assert(got(t(20)) == Some(1.0))  // between the updates
    assert(got(t(40)) == Some(2.0))  // after the second
  }

  test("stream-snapshot CLI mode appends the upsert changelog; latest " +
      "row per key is the snapshot") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val d = new java.io.File(s"$tmp/in/events"); d.mkdirs()
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    val w = new java.io.PrintWriter(s"$d/part-0.csv")
    w.println("user_id,event_id,ts,event_type,value")
    Seq(s"1,10,${t(10)},a,1.0", s"1,20,${t(30)},b,2.0",
      s"2,11,${t(5)},c,3.0", s"1,5,${t(20)},late-loser,9.0")
      .foreach(w.println)
    w.close()
    val n = Main.runStreamSnapshot(spark, s"$tmp/in", s"$tmp/out")
    // one micro-batch: one winner per key → 2 changelog rows, the
    // late loser rejected by (ts, event_id) order
    assert(n == 2, s"expected 2 changelog rows, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_snapshot")
      .collect().map(r => r.getAs[Long]("userId") ->
        (r.getAs[Long]("lastEventId"),
          r.getAs[String]("lastEventType"),
          r.getAs[Double]("lastValue"))).toMap
    assert(got(1L) == ((20L, "b", 2.0)))
    assert(got(2L) == ((11L, "c", 3.0)))
  }

  test("stream-changelog CLI mode lands the I/U/D apply rows; latest " +
      "row per key is the upsert/tombstone to apply") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val d = new java.io.File(s"$tmp/in/changelog"); d.mkdirs()
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    val w = new java.io.PrintWriter(s"$d/part-0.csv")
    w.println("op,seq,event_id,ts,user_id,event_type,value")
    // key 1: I then U (U wins); key 2: D; key 3: D then a STALE lower-
    // seq U that must not resurrect it
    Seq(s"I,1,1,${t(10)},100,ins,1.0", s"U,2,1,${t(20)},100,upd,2.0",
      s"D,3,2,,,,", s"D,3,3,,,,", s"U,2,3,${t(30)},300,zombie,9.0")
      .foreach(w.println)
    w.close()
    val n = Main.runStreamChangelog(spark, s"$tmp/in", s"$tmp/out")
    // one micro-batch: one winner per key → 3 apply rows
    assert(n == 3, s"expected 3 apply rows, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_changelog")
      .collect().map(r => r.getAs[Long]("eventId") ->
        (r.getAs[String]("op"), r.getAs[Long]("seq"),
          Option(r.get(r.fieldIndex("value")))
            .map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) == (("U", 2L, Some(2.0))))
    assert(got(2L) == (("D", 3L, None)))
    assert(got(3L) == (("D", 3L, None)))
  }

  test("stream-cdcextract CLI mode lands the minimal I/U/D feed from " +
      "two snapshot directories") {
    val tmp = Files.createTempDirectory("graft-main").toString
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    def write(side: String, rows: Seq[String]): Unit = {
      val d = new java.io.File(s"$tmp/in/$side"); d.mkdirs()
      val w = new java.io.PrintWriter(s"$d/part-0.csv")
      w.println("event_id,ts,user_id,event_type,value")
      rows.foreach(w.println)
      w.close()
    }
    // key 1 vanishes (D), 2 unchanged (no emit), 3 changes (U), 4 new
    // (I); the identical far-future sentinel pair advances the
    // watermark past the horizon so the half-joined keys finalize
    write("snap_a", Seq(s"1,${t(0)},100,orig,1.0",
      s"2,${t(1)},200,orig,2.0", s"3,${t(2)},300,orig,3.0",
      s"999,${t(5000)},0,wm,0.0"))
    write("snap_b", Seq(s"2,${t(3)},200,orig,2.0",
      s"3,${t(4)},300,changed,3.5", s"4,${t(5)},400,new,4.0",
      s"999,${t(5000)},0,wm,0.0"))
    val n = Main.runStreamCdcExtract(spark, s"$tmp/in", s"$tmp/out",
      horizonMs = 300000L)
    assert(n == 3, s"expected 3 I/U/D rows, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_cdc_extract")
      .collect().map(r => r.getAs[String]("op") ->
        r.getAs[Long]("eventId")).toSet
    assert(got == Set("D" -> 1L, "U" -> 3L, "I" -> 4L), s"got $got")
  }

  test("stream-sessions CLI mode lands watermark-finalized sessions " +
      "only") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val d = new java.io.File(s"$tmp/in/events"); d.mkdirs()
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    val w = new java.io.PrintWriter(s"$d/part-0.csv")
    w.println("user_id,ts,value")
    // user 1: two sessions (gap 40 min > 30); user 2: one session; the
    // far-future row advances the watermark so all of those finalize
    // while ITS OWN session stays open and must not land
    Seq(s"1,${t(0)},1.0", s"1,${t(10)},2.0", s"1,${t(50)},3.0",
      s"2,${t(5)},5.0", s"9,${t(5000)},0.0").foreach(w.println)
    w.close()
    val n = Main.runStreamSessions(spark, s"$tmp/in", s"$tmp/out",
      gap = "30 minutes", watermark = "0 seconds")
    assert(n == 3, s"expected 3 finalized sessions, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_sessions")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(got == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }

  test("compact CLI mode shrinks a fragmented partitioned table in " +
      "place") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main").toString
    val tbl = s"$tmp/t"
    (1 to 2000).map(i => (i.toLong, i % 2, i * 1.0))
      .toDF("id", "part", "v")
      .repartition(6, col("id"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = graft.ops.Compact.listPartitions(spark, tbl, "part")
    assert(before.forall(_._2 >= 3))
    val (touched, total, filesBefore) =
      Main.runCompact(spark, tbl, "part", "id", 1L << 30)
    assert(touched == 2 && total == 2 && filesBefore >= 6)
    val after = graft.ops.Compact.listPartitions(spark, tbl, "part")
    assert(after.forall(_._2 == 1), s"still fragmented: $after")
    assert(spark.read.parquet(tbl).count() == 2000L)
  }

  test("stream-interval CLI mode pairs points with covering intervals") {
    val tmp = Files.createTempDirectory("graft-main").toString
    def write(sub: String, header: String, lines: Seq[String]): Unit = {
      val d = new java.io.File(s"$tmp/in/$sub"); d.mkdirs()
      val w = new java.io.PrintWriter(s"$d/part-0.csv")
      w.println(header); lines.foreach(w.println); w.close()
    }
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    write("intervals", "iid,s0,s1",
      Seq(s"100,${t(0)},${t(45)}", s"200,${t(60)},${t(70)}"))
    write("points", "pid,ts",
      Seq(s"1,${t(10)}", s"2,${t(65)}", s"3,${t(50)}"))
    val n = Main.runStreamInterval(spark, s"$tmp/in", s"$tmp/out",
      maxIntervalSeconds = 7200L, bucketSeconds = 600L)
    assert(n == 2, s"expected two covered points, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_interval")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((1L, 100L), (2L, 200L))) // point 3 covered by nothing
  }

  test("stream-overlap CLI mode pairs intersecting intervals exactly once") {
    val tmp = Files.createTempDirectory("graft-main").toString
    def write(sub: String, header: String, lines: Seq[String]): Unit = {
      val d = new java.io.File(s"$tmp/in/$sub"); d.mkdirs()
      val w = new java.io.PrintWriter(s"$d/part-0.csv")
      w.println(header); lines.foreach(w.println); w.close()
    }
    def t(min: Int) =
      java.time.Instant.ofEpochSecond(1700000000L + min * 60L).toString
    // left [0,45] spans several 10-min buckets with right [30,50] (one
    // emission expected), right [60,70] overlaps nothing on the left
    write("left", "lid,l0,l1", Seq(s"1,${t(0)},${t(45)}"))
    write("right", "rid,r0,r1",
      Seq(s"10,${t(30)},${t(50)}", s"20,${t(60)},${t(70)}"))
    val n = Main.runStreamOverlap(spark, s"$tmp/in", s"$tmp/out",
      maxIntervalSeconds = 7200L, bucketSeconds = 600L)
    assert(n == 1, s"expected one overlapping pair, got $n")
    val got = spark.read.parquet(s"$tmp/out/stream_overlap")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("curate CLI mode: dedup → scrub → select → pack, tables land as parquet") {
    val tmp = Files.createTempDirectory("graft-main").toString
    // the sf0.001 documents plus a planted exact duplicate of doc 0 and
    // a planted PII-bearing doc
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dup = docs.filter(col("doc_id") === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val pii = {
      import spark.implicits._
      Seq((200000L,
        "reach admin@example.com at 10.1.2.3 about the batch window"))
        .toDF("doc_id", "text")
    }
    docs.union(dup).union(pii)
      .write.parquet(s"$tmp/docs_in")

    val counts = Main.runCurate(spark, s"$tmp/docs_in", s"$tmp/out")
    assert(counts("input") == docs.count() + 2)
    // the planted PII doc was counted and its stats row records the hits
    assert(counts("pii_docs") >= 1L)
    val stats = spark.read.parquet(s"$tmp/out/pii_stats")
      .filter(col("doc_id") === 200000L).head()
    assert(stats.getLong(1) == 1L && stats.getLong(2) == 1L)
    // the planted exact duplicate is gone (canonical doc 0 survives);
    // near-dup clustering may drop more, never add (+1: the PII doc)
    assert(counts("after_dedup") <= docs.count() + 1)
    assert(counts("selected") > 0 && counts("selected") <= counts("after_dedup"))
    assert(counts("sequences") > 0)

    val packed = spark.read.parquet(s"$tmp/out/packed")
    Seq("lang_pred", "doc_id", "n_tokens", "seq_id", "seq_offset",
      "spans_boundary").foreach(c => assert(packed.columns.contains(c)))
    assert(packed.count() == counts("selected"))
    // every selected doc's id survived dedup
    val kept = spark.read.parquet(s"$tmp/out/kept_docs")
    val sel = spark.read.parquet(s"$tmp/out/selected")
    assert(sel.join(kept, "doc_id").count() == counts("selected"))
  }

  test("curate full pipeline: gopher, decontamination and semantic dedup drop planted docs at their stages") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main").toString
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "a calm morning walk by the shore with a warm cup of tea and bread"),
      // degenerate: no stopwords, one token repeated → gopher stage
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      // shares a 5-gram with the benchmark split → decontamination stage
      (4L, "the secret benchmark sentence about unique wombat migrations appears here and it was seen with many more common words"),
      (5L, "an entirely different account of winter markets in the old town with lanterns glowing")
    ).toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/docs_in")
    Seq((900L, "quiz answers include the secret benchmark sentence about unique wombat migrations appears here verbatim"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/bench")
    // docs 1 and 5 carry IDENTICAL embeddings: same cell by construction
    // (equal distances to every centroid), pairwise cos = 1, centroid-cos
    // tie → the larger id (5) is pruned. Doc 2 is orthogonal; 3 and 4
    // have no embedding row (pass-through — they're already dropped).
    val e15 = Seq(10.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)
    Seq((1L, e15), (5L, e15),
      (2L, Seq(0.0f, 10.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$tmp/emb")

    val counts = Main.runCurate(spark, s"$tmp/docs_in", s"$tmp/out",
      tokenBudget = 10000L,
      benchPath = Some(s"$tmp/bench"), embPath = Some(s"$tmp/emb"))
    assert(counts("input") == 5)
    assert(counts("after_gopher") == 4, s"gopher: $counts")     // −doc 3
    assert(counts("after_decontam") == 3, s"decontam: $counts") // −doc 4
    assert(counts("after_dedup") == 3, s"near-dup: $counts")    // no pairs
    assert(counts("after_semdedup") == 2, s"semdedup: $counts") // −doc 5
    val kept = spark.read.parquet(s"$tmp/out/kept_docs")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"kept=$kept")
    assert(counts("selected") == 2 && counts("sequences") > 0)
  }

  test("curate distilled-classifier gate tracks the teacher rule") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.write.parquet(s"$tmp/docs_in")
    val counts = Main.runCurate(spark, s"$tmp/docs_in", s"$tmp/out",
      tokenBudget = 100000L, clfGate = true)
    assert(counts("after_classifier") > 0)
    assert(counts("after_classifier") <= counts("after_gopher"))
    // distillation fidelity: the student's keep-set size stays within a
    // few percent of the teacher's own verdict on the same survivors
    // (the q18 rule is near-linear in the student's features here)
    val gophered = docs.join(
      graft.ext.TextOps.gopherFilter(docs).filter(col("pass"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val teacherKeep = graft.ext.TextOps.distillFeatures(gophered)
      .filter(col("is_hq")).count()
    val diff = math.abs(counts("after_classifier") - teacherKeep)
    assert(diff <= math.max(5L, counts("after_gopher") / 20),
      s"student=${counts("after_classifier")} teacher=$teacherKeep")
    assert(counts("selected") > 0 && counts("sequences") > 0)
  }

  test("curate span-removal stage rewrites boilerplate out of survivors") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main").toString
    // both docs open with the same 4-token boilerplate tile; contents
    // otherwise disjoint (3-gram Jaccard 2/50 = 0.04 < the 0.05 gate,
    // so near-dup clustering does NOT pair them — the span stage is
    // the only one that can touch the shared tile)
    val docs = Seq(
      (1L, "click here to subscribe maple copper falcon harbor the violet meadow stone and ember lantern drift of quiet orchard bloom is velvet summit pine for golden reed dusk"),
      (2L, "click here to subscribe tiger salmon breeze canyon the barrel spruce flint and cascade nimbus glade of winter prairie shard is cobalt thistle brook for amber fjord moss")
    ).toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/docs_in")
    val counts = Main.runCurate(spark, s"$tmp/docs_in", s"$tmp/out",
      tokenBudget = 10000L, spanWin = 4)
    // nothing is fully boilerplate → no doc drops at the span stage…
    assert(counts("after_dedup") == 2 && counts("after_span_dedup") == 2,
      s"$counts")
    assert(counts("selected") == 2)
    // …but doc 2 was REWRITTEN: its copy of doc 1's opening tile is
    // gone, so selection sees 24 tokens where doc 1 keeps all 28
    val sel = spark.read.parquet(s"$tmp/out/selected")
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel(1L) == 28L && sel(2L) == 24L, s"sel=$sel")
  }

  test("curate perplexity tail drop removes the rare-token doc") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main").toString
    // five docs drawn from one shared common-word pool (every content
    // token occurs in ≥2 docs) and one planted doc of singleton tokens
    // — by construction the corpus-wide unigram xent maximum
    val docs = Seq(
      (1L, "the garden tea and bread walk in morning with a cup of river park home"),
      (2L, "a walk near the river park and home with tea of bread cup for morning"),
      (3L, "zqxv wvut the pklm mnbj and xcvq qwer of rtyu uiop zxcv"),
      (4L, "morning bread in a park and the tea walk with home river of garden cup"),
      (5L, "river home and garden walk the cup with park tea in bread a of morning"),
      (6L, "walk tea the home and river in cup garden with morning park bread of a")
    ).toDF("doc_id", "text")
    docs.write.parquet(s"$tmp/docs_in")
    val counts = Main.runCurate(spark, s"$tmp/docs_in", s"$tmp/out",
      tokenBudget = 10000L, dropPplTail = true)
    // all six reach the ppl stage (pairwise 3-gram overlap below the
    // near-dup gate), then the tail third (2 of 6) drops — the planted
    // singleton-token doc 3 must be in it
    assert(counts("after_dedup") == 6, s"$counts")
    assert(counts("after_ppl_filter") == 4, s"$counts")
    val kept = spark.read.parquet(s"$tmp/out/kept_docs")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(3L), s"kept=$kept")
    assert(counts("selected") == 4)
  }

  test("curate mixture-epoch stage lands a deterministic manifest over " +
    "the selection") {
    val tmp = Files.createTempDirectory("graft-main").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .write.parquet(s"$tmp/docs_in")
    val counts = Main.runCurate(spark, s"$tmp/docs_in", s"$tmp/out",
      tokenBudget = 100000L, mixEpoch = true)
    val mix = spark.read.parquet(s"$tmp/out/mixture")
    assert(counts("mixture_rows") == mix.count() && mix.count() > 0)
    Seq("doc_id", "source", "n_tokens", "copy", "ord")
      .foreach(c => assert(mix.columns.contains(c)))
    // every manifest doc is a selected doc, groups are the predicted
    // languages, and (doc_id, copy) rows are unique with 32-hex ord keys
    val sel = spark.read.parquet(s"$tmp/out/selected")
    assert(mix.join(sel, "doc_id").count() == mix.count())
    val langs = sel.select(col("lang_pred")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(mix.select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet.subsetOf(langs))
    assert(mix.select(col("doc_id"), col("copy")).distinct().count()
      == mix.count())
    assert(mix.collect().forall(
      _.getAs[String]("ord").matches("[0-9a-f]{32}")))
  }

  test("aa-smurf CLI pipeline runs from the reference's dense matrix") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val n = Main.runAaSmurf(spark,
      "/root/reference/data/sample_matrix.txt", s"$tmp/out")
    assert(n > 0)
    val order = spark.read.parquet(s"$tmp/out/smurf_order")
    assert(order.count() == n)
    // a permutation: positions are distinct
    val pos = order.select(col("pos")).distinct().count()
    assert(pos == n)
    // S6 spy figure: before/after raster of the reference's own matrix
    val spy = javax.imageio.ImageIO.read(
      new java.io.File(s"$tmp/out/reorder.png"))
    assert(spy != null && spy.getWidth > 200)
  }

  test("profile CLI mode: sketch tables land with their guarantees intact") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val counts = Main.runProfile(spark,
      s"$sfDir/documents.parquet", s"$tmp/out")
    assert(counts("sources") > 0 && counts("vocab") > 0)
    assert(counts("heavy_hitters") <= counts("vocab"))
    val hll = spark.read.parquet(s"$tmp/out/profile_distinct")
    // tiny per-source vocab at sf0.001 sits in HLL's small regime — the
    // linear-counting branch (literal-table m·ln(m/V)) now holds the
    // bound there too, so the flag is assertable
    assert(hll.columns.toSet.contains("hll_estimate"))
    assert(hll.filter(col("exact_distinct") <= 0).count() == 0)
    assert(hll.filter(!col("within_bound")).count() == 0,
      "HLL estimate outside the 3-sigma bound even with LC correction")
    val hh = spark.read.parquet(s"$tmp/out/profile_heavy")
    assert(hh.filter(!col("overcount_ok")).count() == 0,
      "CM one-sided guarantee violated")
    // the q98 quantile stage: one row per φ, one-sided estimates
    val qs = spark.read.parquet(s"$tmp/out/profile_quantiles")
    assert(counts("quantiles") == 5)
    assert(qs.filter(!col("est_le_exact")).count() == 0,
      "dyadic-CM one-sided guarantee violated")
    assert(qs.filter(col("q_est") > 0).count() > 0,
      "token-count quantiles degenerate to zero")
  }

  test("stats CLI mode: one-pass per-column profile with native-type " +
      "min/max") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val n = Main.runStats(spark, s"$sfDir/documents.parquet",
      Some(Seq("doc_id", "lang", "n_chars")), s"$tmp/out")
    assert(n == 3)
    val st = spark.read.parquet(s"$tmp/out/table_stats").collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val docs = st("doc_id")
    assert(docs.getAs[Long]("n_nulls") == 0)
    assert(docs.getAs[Long]("n_distinct") == docs.getAs[Long]("n_rows"))
    // min/max computed on the NATIVE type then stringified: numeric
    // order, not lexicographic (n_chars min is a small number even
    // though "100" < "99" as strings)
    val nc = st("n_chars")
    assert(nc.getAs[String]("min_val").toLong <=
      nc.getAs[String]("max_val").toLong)
  }

  test("zorder CLI mode: rewritten files carry tight 2-D boxes and " +
      "identical data") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main").toString
    val src = s"$tmp/in"
    (0L until 40000L).map(i => (i % 200, (i / 200) * 7 % 200))
      .toDF("a", "b").write.mode("overwrite").parquet(src)
    val stats = Main.runZorder(spark, src, "a", "b", s"$tmp/out", 32)
    assert(stats("rows") == 40000L && stats("files") == 32L)
    // z-locality: the median file's box must be far tighter than the
    // full domain on BOTH dimensions (a linear sort leaves one at 100 %)
    assert(stats("median_span_a") * 2 <= stats("domain_a"),
      s"a-span ${stats("median_span_a")} of ${stats("domain_a")}")
    assert(stats("median_span_b") * 2 <= stats("domain_b"),
      s"b-span ${stats("median_span_b")} of ${stats("domain_b")}")
    // and the rewrite is a permutation, not a transformation
    val back = spark.read.parquet(s"$tmp/out/zorder")
      .groupBy(col("a"), col("b")).count()
    val orig = spark.read.parquet(src)
      .groupBy(col("a"), col("b")).count()
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }

  test("vlog CLI mode: init/upsert/append/optimize/read/changes/vacuum " +
      "full cycle over a versioned table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-vlog-cli")
      .toString
    val tbl = s"$tmp/t"
    def write(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val p = s"$tmp/$name"; df.write.mode("overwrite").parquet(p); p
    }
    val base = write((1 to 40).map(i =>
      (i.toLong, (i - 1) / 10 + 1, i * 1.0)).toDF("id", "part", "v"),
      "base")
    assert(Main.runVlog(spark, "init", tbl,
      Map("--d" -> base, "--p" -> "part", "--s" -> "id"))
      .contains("v0"))
    val batch = write(Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "b1")
    assert(Main.runVlog(spark, "upsert", tbl,
      Map("--d" -> batch, "--k" -> "id", "--p" -> "part"))
      .contains("v1"))
    val slab = write(Seq((101L, 1, 101.0)).toDF("id", "part", "v"), "b2")
    assert(Main.runVlog(spark, "append", tbl, Map("--d" -> slab,
      "--p" -> "part")).contains("v2"))
    assert(Main.runVlog(spark, "optimize", tbl,
      Map("--p" -> "part", "--z" -> "id", "--s" -> "id"))
      .contains("4 files"))
    // read v0 (time travel) and head through the CLI surface
    assert(Main.runVlog(spark, "read", tbl,
      Map("--v" -> "0", "--o" -> s"$tmp/out")).contains("40 rows"))
    assert(Main.runVlog(spark, "read", tbl,
      Map("--o" -> s"$tmp/out")).contains("41 rows"))
    val chg = Main.runVlog(spark, "changes", tbl, Map("--a" -> "0",
      "--b" -> "2", "--k" -> "id", "--c" -> "v", "--o" -> s"$tmp/out"))
    assert(chg.contains("2 changes"), chg) // U(3) + I(101)
    val got = spark.read.parquet(s"$tmp/out/changes_v0_v2")
      .select($"op", $"id").as[(String, Long)].collect().toSet
    assert(got == Set(("U", 3L), ("I", 101L)))
    // merge-on-read delete + purge through the CLI surface
    val vic = write(Seq(5L).toDF("id"), "vic")
    assert(Main.runVlog(spark, "delete-mor", tbl,
      Map("--d" -> vic, "--k" -> "id")).contains("zero base writes"))
    assert(graft.ops.TxLog.readVersion(spark, tbl, 4)
      .filter($"id" === 5L).count() == 0L)
    assert(Main.runVlog(spark, "purge-mor", tbl, Map("--p" -> "part"))
      .contains("folded as v5"))
    assert(graft.ops.TxLog.entriesOf(tbl, 5).forall(_.kind == "data"))
    assert(Main.runVlog(spark, "vacuum", tbl, Map("--r" -> "1"))
      .contains("manifests"))
    assert(graft.ops.TxLog.readVersion(spark, tbl, 5).count() == 40L)
  }
}
