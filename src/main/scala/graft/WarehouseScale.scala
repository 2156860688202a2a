package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale run record for the warehouse family (q104/q107/q108/
  * q109 operators) at ~1000× the bench scale, with closed-form planted
  * truth (dev tool, run manually; results recorded in README, like
  * SketchScale).
  *
  * Event log (default 50M rows, 100k users, one event per user every
  * 10 s): every aggregate below has an exact closed form, asserted.
  *  - latest snapshot: exactly one row per user, and user u's last
  *    event id is n − users + u, so Σ last_event_id is closed-form;
  *  - hourly gap-fill over a 2-hour-cadence remap of the same log:
  *    each user's dense span is 2·(perUser−1)+1 hours, exactly
  *    perUser−1 of them zero rows — counts closed-form;
  *  - trailing 1-hour moving average: user-local frame sizes ramp
  *    1,2,…,361 then hold at 361, so Σ n_frame is closed-form;
  *  - triangles: 20k disjoint K5 cliques (every node in C(4,2) = 6
  *    triangles) plus a 100k-edge triangle-free star overlay — the
  *    hub's wedge fan-out is exactly the orientation claim under test.
  */
object WarehouseScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val users = 100000L
    require(n % users == 0)
    val perUser = n / users
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    val base = 1700000000L
    def events(cadenceSec: Long) = spark.range(n).select(
      pmod(col("id"), lit(users)).as("user_id"),
      col("id").as("event_id"),
      timestamp_seconds(lit(base) +
        (col("id") / lit(users)).cast("long") * cadenceSec).as("ts"),
      pmod(col("id"), lit(1000L)).cast("double").as("value"))

    // ───── q104 latest snapshot ─────
    val tS = t0()
    val snap = graft.ops.TimeSeries.latestSnapshot(events(10L),
      "user_id", "ts", "event_id", Seq("value"))
    val snapAgg = snap.agg(count(lit(1)).as("rows"),
      sum(col("last_event_id")).as("ids")).collect()(0)
    val snapSec = secs(tS)
    assert(snapAgg.getAs[Long]("rows") == users, "snapshot row count")
    // Σ_u (n − users + u) = users·(n − users) + users·(users−1)/2
    val wantIds = users * (n - users) + users * (users - 1) / 2
    assert(snapAgg.getAs[Long]("ids") == wantIds,
      s"snapshot ids ${snapAgg.getAs[Long]("ids")} != $wantIds")

    // ───── q107 gap-fill (2-hour cadence ⇒ half the dense hours are
    // planted zeros) ─────
    val tG = t0()
    val gf = graft.ops.TimeSeries.gapfillHourly(events(7200L),
      "user_id", "ts", "value")
    val gfAgg = gf.agg(count(lit(1)).as("rows"),
      sum(when(col("n") === 0, 1L).otherwise(0L)).as("zeros")).collect()(0)
    val gfSec = secs(tG)
    val wantDense = users * (2 * (perUser - 1) + 1)
    assert(gfAgg.getAs[Long]("rows") == wantDense,
      s"gapfill rows ${gfAgg.getAs[Long]("rows")} != $wantDense")
    assert(gfAgg.getAs[Long]("zeros") == users * (perUser - 1),
      "gapfill zero-row count")

    // ───── q108 moving average (10 s cadence, 1 h frame ⇒ frames ramp
    // to 361 then hold) ─────
    val tM = t0()
    val ma = graft.ops.TimeSeries.movingAvg(events(10L),
      "user_id", "event_id", "ts", "value")
    val maAgg = ma.agg(count(lit(1)).as("rows"),
      sum(col("n_frame")).as("frames")).collect()(0)
    val maSec = secs(tM)
    assert(maAgg.getAs[Long]("rows") == n, "moving-avg row count")
    val full = math.min(perUser, 361L)
    val wantFrames = users * (full * (full + 1) / 2 +
      math.max(0L, perUser - full) * full)
    assert(maAgg.getAs[Long]("frames") == wantFrames,
      s"frame sum ${maAgg.getAs[Long]("frames")} != $wantFrames")

    // ───── q109 triangles: 20k disjoint K5s + a triangle-free star ─────
    val cliques = 20000L
    val k5 = spark.range(cliques * 10).select(
      expr("id div 10").as("c"), pmod(col("id"), lit(10L)).as("p"))
      .select(
        // the 10 edges of K5 in one lookup table
        (col("c") * 5 + element_at(
          typedLit(Seq(0, 0, 0, 0, 1, 1, 1, 2, 2, 3)),
          (col("p") + 1).cast("int"))).as("src"),
        (col("c") * 5 + element_at(
          typedLit(Seq(1, 2, 3, 4, 2, 3, 4, 3, 4, 4)),
          (col("p") + 1).cast("int"))).as("dst"))
    val hub = cliques * 5
    val star = spark.range(100000L).select(
      lit(hub).as("src"), (col("id") + hub + 1).as("dst"))
    val tT = t0()
    val tri = graft.ops.GraphOps.triangleCounts(k5.union(star))
    val triAgg = tri.agg(count(lit(1)).as("rows"),
      sum(col("n_triangles")).as("tris"),
      max(col("n_triangles")).as("mx")).collect()(0)
    val triSec = secs(tT)
    assert(triAgg.getAs[Long]("rows") == cliques * 5,
      "triangle node count (star must contribute none)")
    assert(triAgg.getAs[Long]("tris") == cliques * 5 * 6,
      "triangle corner sum")
    assert(triAgg.getAs[Long]("mx") == 6, "per-node triangle count")

    // ───── q110/q111 at scale: the partitioned fact layout, DPP, and
    // the copy-on-write merge — on a 42-day, day-partitioned write of
    // the same 50M-row log (2 h cadence, midnight-aligned epoch so the
    // per-day row counts are closed-form: 12 cadence slots per day,
    // 8 on the last) ─────
    val base2 = 1700006400L // midnight UTC — day index = k div 12
    val root = java.nio.file.Files.createTempDirectory("graft-whscale")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    val facts = root.resolve("facts").toString
    val ev2 = spark.range(n).select(
      pmod(col("id"), lit(users)).as("user_id"),
      col("id").as("event_id"),
      timestamp_seconds(lit(base2) +
        (col("id") / lit(users)).cast("long") * 7200L).as("ts"),
      pmod(col("id"), lit(1000L)).cast("double").as("value"))
      .withColumn("day", date_format(col("ts"), "yyyyMMdd").cast("int"))
    val nDays = ((perUser + 11) / 12).toInt // 42 at the default scale
    def slots(d: Int): Long = math.min(perUser, 12L * (d + 1)) - 12L * d
    val tW = t0()
    ev2.repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(facts)
    val writeSec = secs(tW)

    // DPP: weekend dim (day index ≡ 5, 6 mod 7 — an attribute the
    // optimizer cannot invert into a static day predicate), broadcast
    // join on the partition column; the fact scan must read ONLY the
    // weekend partitions, asserted via the runtime metric
    val weekendIdx = (0 until nDays).filter(d => d % 7 == 5 || d % 7 == 6)
    val wantWeekendRows = users * weekendIdx.map(slots).sum
    val dim = spark.range(nDays).select(
      date_format(timestamp_seconds(lit(base2) + col("id") * 86400L),
        "yyyyMMdd").cast("int").as("day_key"),
      pmod(col("id"), lit(7L)).as("dow"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (dppSec, partsRead) =
      try {
        // the aggregate is part of THIS plan: metrics must be read off
        // the executed plan instance, and count() would execute a
        // different one
        val q = spark.read.parquet(facts)
          .join(dim.filter(col("dow").isin(5, 6)),
            col("day") === col("day_key"))
          .groupBy().agg(count(lit(1)).as("rows"))
        val tD = t0()
        // collect(), not head()/count(): those wrap the plan in a new
        // query execution, and the partitions-read metric lives on THIS
        // plan's scan node
        val got = q.collect()(0).getLong(0)
        val dSec = secs(tD)
        assert(got == wantWeekendRows,
          s"dpp weekend rows $got != $wantWeekendRows")
        val scan = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.partitionSchema.nonEmpty => s }
        assert(scan.nonEmpty && scan.head.partitionFilters.exists(
          _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst
            .expressions.DynamicPruningExpression])),
          "no dynamic-pruning subquery on the 50M fact scan")
        (dSec, scan.head.metrics("numPartitions").value)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(partsRead == weekendIdx.size.toLong,
      s"DPP read $partsRead partitions, wanted ${weekendIdx.size} of $nDays")

    // copy-on-write merge: corrections (value += 1000) for id % 97 == 0
    // inside the first three days; value is integer-valued and every
    // sum stays far under 2^53, so the post-merge total is EXACT
    val sumBefore = spark.read.parquet(facts)
      .agg(sum(col("value"))).head().getDouble(0)
    val batch = ev2.filter(col("day") < lit(dayKeyOf(base2, 3)))
      .filter(col("event_id") % 97 === 0) // corrections in days 0, 1, 2
      .withColumn("value", col("value") + 1000.0)
    val nUpd = batch.count()
    import scala.jdk.CollectionConverters._
    def untouchedMd5(): Map[String, String] = {
      val p = java.nio.file.Paths.get(facts)
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith(".") &&
          !weekdaysTouched(base2).exists(d =>
            f.toString.contains(s"day=$d")))
        .map { f =>
          val dig = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f))
          p.relativize(f).toString ->
            dig.map("%02x".format(_)).mkString
        }.toMap
    }
    val before = untouchedMd5()
    val tC = t0()
    val touched = graft.ops.Cow.mergeCow(spark, facts, batch,
      "event_id", "day")
    val cowSec = secs(tC)
    assert(touched.size == 3, s"touched ${touched.size} partitions")
    val after = untouchedMd5()
    assert(before == after && before.nonEmpty,
      "untouched partitions' files changed across the 50M CoW merge")
    val merged = spark.read.parquet(facts)
      .agg(count(lit(1)).as("rows"), sum(col("value")).as("s"))
      .head()
    assert(merged.getAs[Long]("rows") == n, "CoW changed the row count")
    assert(merged.getAs[Double]("s") == sumBefore + 1000.0 * nUpd,
      "CoW value total off the closed form")

    // ───── q127 small-file compaction over the post-merge layout ─────
    // the CoW merge just rewrote its 3 touched days through a shuffle, so
    // exactly those partitions are now multi-file; a huge target plans 1
    // file per day and must touch ONLY them, preserving the exact totals
    val partsBefore = graft.ops.Compact.listPartitions(spark, facts, "day")
    val fragmented = partsBefore.filter(_._2 > 1).map(_._1).toSet
    assert(fragmented == weekdaysTouched(base2).map(_.toString).toSet,
      s"unexpected fragmented partitions: $fragmented")
    val tK = t0()
    val plans = graft.ops.Compact.compactPartitions(spark, facts, "day",
      "event_id", 8L << 30)
    val compactSec = secs(tK)
    assert(plans.filter(_.touched).map(_.value).toSet == fragmented)
    val partsAfter = graft.ops.Compact.listPartitions(spark, facts, "day")
    assert(partsAfter.forall(_._2 == 1),
      s"compaction left multi-file partitions: ${partsAfter.filter(_._2 > 1)}")
    val compacted = spark.read.parquet(facts)
      .agg(count(lit(1)).as("rows"), sum(col("value")).as("s")).head()
    assert(compacted.getAs[Long]("rows") == n &&
      compacted.getAs[Double]("s") == sumBefore + 1000.0 * nUpd,
      "compaction changed the data")

    // ───── compactPartitionsZ: OPTIMIZE ZORDER at the full 50M ─────
    // fragment a copy of the facts (16 files/day) carrying two 16-bit
    // clustering dims, then compact WITH z-reclustering — one
    // distributed (day, z) range rewrite of all 50M rows. A 2-D box
    // query then touches a small fraction of files; the md5-compacted
    // facts table's one-file-per-day layout necessarily touches every
    // file (each spans all users), so the fraction IS the win.
    val zfacts = root.resolve("zfacts").toString
    spark.read.parquet(facts)
      .withColumn("u16", col("user_id").bitwiseAND(lit(65535L)))
      .withColumn("v16",
        col("value").cast("long").bitwiseAND(lit(65535L)))
      .repartition(16, col("event_id"))
      .write.mode("overwrite").partitionBy("day").parquet(zfacts)
    val zBytes = graft.ops.Compact.listPartitions(spark, zfacts, "day")
      .map(_._3).sum
    val tZ = t0()
    val zPlans = graft.ops.Compact.compactPartitionsZ(spark, zfacts,
      "day", "event_id", zBytes / (8L * nDays), Seq("u16", "v16"))
    val zSec = secs(tZ)
    assert(zPlans.forall(_.touched), "z-compaction skipped a partition")
    val zAgg = spark.read.parquet(zfacts)
      .agg(count(lit(1)).as("rows"), sum(col("value")).as("s")).head()
    assert(zAgg.getAs[Long]("rows") == n &&
      zAgg.getAs[Double]("s") == sumBefore + 1000.0 * nUpd,
      "z-compaction changed the data")
    val zStats = graft.ops.Layout.fileStatsK(spark, zfacts,
      Seq("u16", "v16")).persist()
    val zFiles = zStats.count()
    val zTouched = graft.ops.Layout.filesTouchedK(zStats,
      Seq("u16" -> ((1000L, 2000L)), "v16" -> ((100L, 300L))))
    zStats.unpersist()
    val zFrac = zTouched.toDouble / zFiles
    assert(zFiles < 16L * nDays, "z-compaction merged nothing")
    assert(zFrac <= 0.5,
      f"z layout touched $zTouched of $zFiles files ($zFrac%.2f) — " +
        "no co-clustering win")

    // ───── q130 transaction log: commit, upsert, time travel, vacuum ─────
    val vtbl = root.resolve("vlog").toString
    val tV = t0()
    graft.ops.TxLog.commitInitial(spark, vtbl, ev2, "day")
    graft.ops.TxLog.commitUpsert(spark, vtbl, batch, "event_id", "day")
    val txCommitSec = secs(tV)
    val tTr = t0()
    val v0Sum = graft.ops.TxLog.readVersion(spark, vtbl, 0)
      .agg(sum(col("value"))).head().getDouble(0)
    val v1Sum = graft.ops.TxLog.readVersion(spark, vtbl, 1)
      .agg(sum(col("value"))).head().getDouble(0)
    val travelSec = secs(tTr)
    assert(v0Sum == sumBefore, "v0 snapshot disturbed by the v1 commit")
    assert(v1Sum == sumBefore + 1000.0 * nUpd, "v1 upsert total off")
    val (vacFiles, vacManifests) = graft.ops.TxLog.vacuum(spark, vtbl, 1)
    assert(vacManifests == 1 && vacFiles == 3,
      s"vacuum removed ($vacFiles files, $vacManifests manifests); " +
        "wanted exactly v0's 3 superseded day files")
    assert(graft.ops.TxLog.readVersion(spark, vtbl, 1)
      .agg(sum(col("value"))).head().getDouble(0) ==
      sumBefore + 1000.0 * nUpd, "v1 unreadable after vacuum")

    // ───── round 15: blind append + OPTIMIZE + stats-pruned read
    // under the log (q151/q152 at the full 50M) ─────
    // append a fresh slab (the correction rows re-keyed above n — new
    // ids, days 0-2) as a blind-append commit carrying file stats
    val slab = batch.withColumn("event_id", col("event_id") + lit(n))
    val slabAgg = slab.agg(count(lit(1)).as("r"),
      sum(col("value")).as("s")).head()
    val tAp = t0()
    val vApp = graft.ops.TxLog.commitAppend(spark, vtbl, slab, "day",
      statsCols = Seq("event_id"))
    val txAppendSec = secs(tAp)
    assert(vApp == 2, s"append landed as v$vApp")
    val v2Agg = graft.ops.TxLog.readVersion(spark, vtbl, 2)
      .agg(count(lit(1)).as("rows"), sum(col("value")).as("s")).head()
    assert(v2Agg.getAs[Long]("rows") == n + slabAgg.getAs[Long]("r") &&
      v2Agg.getAs[Double]("s") ==
        sumBefore + 1000.0 * nUpd + slabAgg.getAs[Double]("s"),
      "append changed more than the slab")
    // OPTIMIZE the whole table as an OCC commit: 50M rows re-cluster
    // (sorted by user_id within each day) and compact to 1 file/day,
    // data identical, stats refreshed
    val tOp = t0()
    val vOpt = graft.ops.TxLog.commitOptimize(spark, vtbl, "day",
      zorder = Seq("user_id"), statsCols = Seq("event_id"))
    val txOptimizeSec = secs(tOp)
    assert(vOpt == 3, s"optimize landed as v$vOpt")
    val optFiles = graft.ops.TxLog.filesOf(vtbl, 3)
    assert(optFiles.size == nDays,
      s"optimize left ${optFiles.size} files, wanted 1/day × $nDays")
    val v3Agg = graft.ops.TxLog.readVersion(spark, vtbl, 3)
      .agg(count(lit(1)).as("rows"), sum(col("value")).as("s")).head()
    assert(v3Agg == v2Agg, "OPTIMIZE changed the data")
    // stats-pruned read of one day's id band: event_id ≡ day, so the
    // manifest prune opens day 5's file plus ONLY the three day files
    // whose ranges the re-keyed append slab stretched across the probe
    // band (wide-range files defeat min/max pruning — the honest
    // caveat) — 4 of 42 files instead of a full scan
    val dayIds = 12L * users
    val bandLo = 5L * dayIds
    val bandHi = 6L * dayIds - 1L
    val (pf, pTotal) = graft.ops.TxLog.prunedFiles(vtbl, 3,
      Seq("event_id" -> (bandLo.toDouble, bandHi.toDouble)))
    assert(pTotal == nDays && pf.size == 4,
      s"pruned to ${pf.size} of $pTotal files, wanted 4 " +
        "(day 5 + the 3 slab-stretched days)")
    val tPr = t0()
    val prRows = graft.ops.TxLog.readVersionPruned(spark, vtbl, 3,
        Seq("event_id" -> (bandLo.toDouble, bandHi.toDouble)))
      .filter(col("event_id").between(bandLo, bandHi)).count()
    val prunedReadSec = secs(tPr)
    assert(prRows == dayIds, s"pruned read returned $prRows rows")

    // ───── round 15: merge-on-read equality delete at the full 50M ─────
    // the delete lands ONE key file against the 50M-row versioned
    // table (zero base writes — O(batch) however big the table), the
    // MoR read hides exactly the victims, and the purge folds only the
    // key-bearing partitions
    val delKeys = spark.range(n / users).select(
      (col("id") * users).as("event_id")) // user 0's rows: every slot
    val nDel = n / users
    val tMd = t0()
    val vMor = graft.ops.TxLog.commitDeleteMor(spark, vtbl, delKeys,
      "event_id")
    val morDeleteSec = secs(tMd)
    val tMr = t0()
    val morCount = graft.ops.TxLog.readVersion(spark, vtbl, vMor).count()
    val morReadSec = secs(tMr)
    val v3Rows = v3Agg.getAs[Long]("rows")
    assert(morCount == v3Rows - nDel,
      s"MoR read $morCount != ${v3Rows - nDel}")
    val tMp = t0()
    val vPurge = graft.ops.TxLog.commitPurgeMor(spark, vtbl, "day")
    val morPurgeSec = secs(tMp)
    assert(graft.ops.TxLog.entriesOf(vtbl, vPurge)
      .forall(_.kind == "data"), "purge left delete entries")
    assert(graft.ops.TxLog.readVersion(spark, vtbl, vPurge).count() ==
      v3Rows - nDel, "purge changed the visible data")

    // ───── q126 bloom semijoin: 1 % user dim against the 50M fact ─────
    val dimUsers = spark.range(users / 100).select(
      (col("id") * 100L).as("u")) // users ≡ 0 (mod 100): 1 % selectivity
    val wantMatch = (users / 100) * perUser
    val tB = t0()
    val screened = graft.ops.BloomJoin.bloomScreen(
      spark.read.parquet(facts), "user_id", dimUsers, "u").count()
    val semi = graft.ops.BloomJoin.bloomSemiJoin(
      spark.read.parquet(facts), "user_id", dimUsers, "u").count()
    val bloomSec = secs(tB)
    assert(semi == wantMatch, s"bloom semijoin $semi != $wantMatch")
    assert(screened >= wantMatch && screened <= wantMatch + n / 100,
      s"screen kept $screened — outside [$wantMatch, fpp bound]")

    println(s"""{"n":$n,"users":$users,""" +
      s""""snapshot_sec":$snapSec,"gapfill_sec":$gfSec,""" +
      s""""gapfill_rows":${gfAgg.getAs[Long]("rows")},""" +
      s""""moving_avg_sec":$maSec,""" +
      s""""triangle_nodes":${triAgg.getAs[Long]("rows")},""" +
      s""""triangle_sec":$triSec,""" +
      s""""fact_write_sec":$writeSec,"dpp_sec":$dppSec,""" +
      s""""dpp_partitions_read":$partsRead,"dpp_partitions_total":$nDays,""" +
      s""""cow_sec":$cowSec,"cow_updates":$nUpd,""" +
      s""""zorder_compact_sec":$zSec,"zorder_files":$zFiles,""" +
      s""""zorder_box_frac":$zFrac,""" +
      s""""compact_sec":$compactSec,""" +
      s""""txlog_commit_sec":$txCommitSec,"time_travel_sec":$travelSec,""" +
      s""""vacuumed_files":$vacFiles,""" +
      s""""txlog_append_sec":$txAppendSec,""" +
      s""""txlog_optimize_sec":$txOptimizeSec,""" +
      s""""pruned_files_read":${pf.size},""" +
      s""""pruned_files_total":$pTotal,""" +
      s""""pruned_read_sec":$prunedReadSec,""" +
      s""""mor_delete_sec":$morDeleteSec,"mor_delete_keys":$nDel,""" +
      s""""mor_read_sec":$morReadSec,"mor_purge_sec":$morPurgeSec,""" +
      s""""bloom_screened":$screened,"bloom_semi_sec":$bloomSec}""")
    spark.stop()
  }

  /** yyyyMMdd integer key of day index `d` from the aligned epoch. */
  private def dayKeyOf(base: Long, d: Int): Int = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.ofEpochSecond(base + d * 86400L)).toInt
  }

  /** The day keys the CoW batch touches (indices 0, 1, 2). */
  private def weekdaysTouched(base: Long): Seq[Int] =
    (0 until 3).map(dayKeyOf(base, _))
}
