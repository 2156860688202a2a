package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Transaction log / time travel (ops/TxLog.scala): the snapshot-
  * isolation guarantees the q130 hash gate cannot fully see — an upsert
  * commit rewrites only touched partitions as NEW files, carries
  * untouched files into the new manifest BY REFERENCE (same physical
  * file, zero copies), and never disturbs a prior version's readability.
  */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  test("commitUpsert reuses untouched files by reference and keeps " +
      "every version readable") {
    val root = Files.createTempDirectory("graft-txlog")
    val tbl = root.resolve("t").toString
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    assert(graft.ops.TxLog.commitInitial(spark, tbl, base, "part") == 0)
    val v0Files = graft.ops.TxLog.filesOf(tbl, 0)
    assert(v0Files.nonEmpty && v0Files.forall(_.startsWith("v0/")))

    // batch touches parts 1 and 2: update ids 3, 14; insert id 99
    val batch = Seq((3L, 1, 300.0), (14L, 2, 1400.0), (99L, 1, 9900.0))
      .toDF("id", "part", "v")
    assert(graft.ops.TxLog.commitUpsert(spark, tbl, batch, "id",
      "part") == 1)
    val v1Files = graft.ops.TxLog.filesOf(tbl, 1)
    // untouched partitions (3, 4): the IDENTICAL v0 paths, by reference
    val keptV0 = v0Files.filter(f =>
      f.contains("__part=3") || f.contains("__part=4"))
    assert(keptV0.nonEmpty)
    keptV0.foreach(f => assert(v1Files.contains(f),
      s"untouched file $f not carried into v1 manifest"))
    // touched partitions: fresh v1/ files only
    v1Files.filter(f =>
      f.contains("__part=1") || f.contains("__part=2"))
      .foreach(f => assert(f.startsWith("v1/"), s"stale touched file $f"))

    // v1 read = the upsert replay
    val got1 = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select(col("id"), col("part").cast("int").as("part"), col("v"))
      .as[(Long, Int, Double)].collect().toSet
    val want1 = (1 to 40).filterNot(i => i == 3 || i == 14)
      .map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0)).toSet ++
      Set((3L, 1, 300.0), (14L, 2, 1400.0), (99L, 1, 9900.0))
    assert(got1 == want1)

    // time travel: v0 STILL reads the original snapshot after v1
    val got0 = graft.ops.TxLog.readVersion(spark, tbl, 0)
      .select(col("id"), col("part").cast("int").as("part"), col("v"))
      .as[(Long, Int, Double)].collect().toSet
    assert(got0 == base.as[(Long, Int, Double)].collect().toSet)

    // a second upsert stacks: v2 references v0 AND v1 files
    val batch2 = Seq((21L, 3, 2100.0)).toDF("id", "part", "v")
    assert(graft.ops.TxLog.commitUpsert(spark, tbl, batch2, "id",
      "part") == 2)
    val v2Files = graft.ops.TxLog.filesOf(tbl, 2)
    assert(v2Files.exists(_.startsWith("v0/")) &&
      v2Files.exists(_.startsWith("v1/")) &&
      v2Files.exists(_.startsWith("v2/")))
    assert(graft.ops.TxLog.readVersion(spark, tbl, 2)
      .filter(col("id") === 21L).select(col("v")).as[Double]
      .collect().toSeq == Seq(2100.0))
    assert(graft.ops.TxLog.currentVersion(tbl) == 2)
  }

  test("vacuum deletes only files no kept manifest references; kept " +
      "versions stay readable") {
    val root = Files.createTempDirectory("graft-txlog3")
    val tbl = root.resolve("t").toString
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part")
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part")
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((14L, 2, 1400.0)).toDF("id", "part", "v"), "id", "part")
    // retain v1 and v2: v0's manifest goes; v0's part=1 file (superseded
    // in v1) goes; v0's part=3/4 files STAY (v1/v2 still reference them)
    val (nFiles, nManifests) = graft.ops.TxLog.vacuum(spark, tbl, 2)
    assert(nManifests == 1)
    assert(nFiles >= 1, "expected at least v0's superseded part=1 file")
    intercept[IllegalArgumentException] {
      graft.ops.TxLog.filesOf(tbl, 0)
    }
    // kept versions read exactly as before the vacuum
    val got1 = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got1.contains((3L, 300.0)) && got1.contains((14L, 14.0)))
    val got2 = graft.ops.TxLog.readVersion(spark, tbl, 2)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got2.contains((3L, 300.0)) && got2.contains((14L, 1400.0)))
    assert(got2.size == 40)
    assert(graft.ops.TxLog.currentVersion(tbl) == 2)
  }

  test("commitUpsert handles partition values that need path escaping " +
      "without duplicating rows") {
    val root = Files.createTempDirectory("graft-txlog4")
    val tbl = root.resolve("t").toString
    // 'a b' lands in the manifest as __part=a%20b; matching against the
    // UNESCAPED batch value would keep the old file AND write the merge
    val base = Seq((1L, "a b", 1.0), (2L, "a b", 2.0), (3L, "c", 3.0))
      .toDF("id", "part", "v")
    // statsCols on purpose: the stats pass round-trips file paths
    // through input_file_name's percent-encoded URIs — an escaped
    // partition (a%20b on disk) must relativize to the SAME relative
    // path the manifest listing produced, or its stats would be lost
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part",
      statsCols = Seq("v"))
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((1L, "a b", 100.0)).toDF("id", "part", "v"), "id", "part",
      statsCols = Seq("v"))
    val got = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSeq
      .sorted
    assert(got == Seq((1L, 100.0), (2L, 2.0), (3L, 3.0)),
      s"duplicated or lost rows: $got")
    // the special-char partition's rewritten file carries its stats
    // (escapePathName leaves spaces as-is — 'a b' IS the dir name; the
    // round trip under test is URI %-encoding through input_file_name)
    val e1 = graft.ops.TxLog.entriesOf(tbl, 1)
      .find(f => f.path.startsWith("v1/") && f.path.contains("a b"))
    assert(e1.exists(_.stats.get("v").contains((2.0, 100.0))),
      s"escaped-partition stats lost: ${graft.ops.TxLog.entriesOf(tbl, 1)}")
  }

  test("commitUpsert on a null partition value neither duplicates nor " +
      "loses its rows") {
    val root = Files.createTempDirectory("graft-txlog6")
    val tbl = root.resolve("t").toString
    // a null partition lands under __HIVE_DEFAULT_PARTITION__; matching
    // the touched set against the string "null" would keep the old file
    // by reference AND rewrite its rows — duplicating them
    val base = Seq((1L, Option.empty[String], 1.0), (2L, Some("x"), 2.0),
      (3L, Option.empty[String], 3.0)).toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part")
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((1L, Option.empty[String], 100.0)).toDF("id", "part", "v"),
      "id", "part")
    val got = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSeq
      .sorted
    assert(got == Seq((1L, 100.0), (2L, 2.0), (3L, 3.0)),
      s"duplicated or lost null-partition rows: $got")
    // the untouched 'x' partition came through by reference
    assert(graft.ops.TxLog.filesOf(tbl, 1)
      .exists(f => f.startsWith("v0/") && f.contains("__part=x")))
  }

  test("vacuum with retention grown past an earlier vacuum clamps to " +
      "surviving manifests") {
    val root = Files.createTempDirectory("graft-txlog5")
    val tbl = root.resolve("t").toString
    val base = Seq((1L, 1, 1.0), (2L, 2, 2.0)).toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part")
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((1L, 1, 10.0)).toDF("id", "part", "v"), "id", "part")
    graft.ops.TxLog.vacuum(spark, tbl, 1) // v0's manifest removed
    // retention grown afterwards: must not crash on the missing v0
    val (f2, m2) = graft.ops.TxLog.vacuum(spark, tbl, 3)
    assert(f2 == 0 && m2 == 0)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 1).count() == 2L)
  }

  test("a batch with a brand-new partition commits cleanly") {
    val root = Files.createTempDirectory("graft-txlog2")
    val tbl = root.resolve("t").toString
    val base = Seq((1L, 1, 1.0), (2L, 2, 2.0)).toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part")
    val batch = Seq((9L, 9, 9.0)).toDF("id", "part", "v")
    graft.ops.TxLog.commitUpsert(spark, tbl, batch, "id", "part")
    val got = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L, 9L))
    // and v0 is untouched
    assert(graft.ops.TxLog.readVersion(spark, tbl, 0)
      .count() == 2L)
    assert(Files.isRegularFile(Paths.get(s"$tbl/_vlog/v1.json")))
  }

  private def initOcc(tag: String) = {
    val root = Files.createTempDirectory(s"graft-txlog-$tag")
    val tbl = root.resolve("t").toString
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part")
    tbl
  }

  test("OCC: two commits from the SAME stale snapshot on disjoint " +
      "partitions both land, linearized") {
    val tbl = initOcc("occ-disj")
    // both writers merged against v0; A lands first, B's snapshot is
    // stale but its partitions are untouched by A — it must land as v2
    val a = Seq((3L, 1, 300.0)).toDF("id", "part", "v")
    val b = Seq((14L, 2, 1400.0)).toDF("id", "part", "v")
    assert(graft.ops.TxLog.commitUpsertFrom(spark, tbl, a, "id", "part",
      start = 0) == 1)
    assert(graft.ops.TxLog.commitUpsertFrom(spark, tbl, b, "id", "part",
      start = 0) == 2)
    val got = graft.ops.TxLog.readVersion(spark, tbl, 2)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got(3L) == 300.0 && got(14L) == 1400.0, "a commit was lost")
    assert(got.size == 40)
    // B's manifest must reference A's fresh part=1 file, not v0's
    assert(graft.ops.TxLog.filesOf(tbl, 2)
      .exists(f => f.startsWith("v1/") && f.contains("__part=1")))
  }

  test("OCC: overlapping stale commit aborts with a retryable conflict " +
      "— exactly one winner, no lost update") {
    val tbl = initOcc("occ-conf")
    val a = Seq((3L, 1, 300.0)).toDF("id", "part", "v")
    val b = Seq((7L, 1, 700.0)).toDF("id", "part", "v")
    assert(graft.ops.TxLog.commitUpsertFrom(spark, tbl, a, "id", "part",
      start = 0) == 1)
    val e = intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitUpsertFrom(spark, tbl, b, "id", "part",
        start = 0)
    }
    assert(e.getMessage.contains("part") && e.getMessage.contains("v1"))
    // the loser left no trace: head is still v1, A's update intact
    assert(graft.ops.TxLog.currentVersion(tbl) == 1)
    val got = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got(3L) == 300.0 && got(7L) == 7.0)
    // and the retry path: re-merged against v1, B now lands
    assert(graft.ops.TxLog.commitUpsertFrom(spark, tbl, b, "id", "part",
      start = 1) == 2)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 2)
      .filter(col("id").isin(3L, 7L)).select("v").as[Double]
      .collect().toSet == Set(300.0, 700.0))
  }

  test("OCC: truly concurrent disjoint writers both land (claim-file " +
      "serialization)") {
    val tbl = initOcc("occ-race")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(2)
    def writer(id: Long, part: Int) = Future {
      val batch = Seq((id, part, id * 100.0)).toDF("id", "part", "v")
      gate.countDown(); gate.await() // both read snapshot v0 first
      graft.ops.TxLog.commitUpsertFrom(spark, tbl, batch, "id", "part",
        start = 0)
    }
    val versions = Await.result(
      Future.sequence(Seq(writer(3L, 1), writer(14L, 2))), 120.seconds)
    assert(versions.toSet == Set(1, 2), s"got $versions")
    val got = graft.ops.TxLog.readVersion(spark, tbl, 2)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got(3L) == 300.0 && got(14L) == 1400.0)
    assert(!Files.exists(Paths.get(s"$tbl/_vlog/v1.claim")) &&
      !Files.exists(Paths.get(s"$tbl/_vlog/v2.claim")), "claim leaked")
  }

  test("commitDelete: victims gone in the new version, prior versions " +
      "intact, untouched files by reference, emptied partition vanishes " +
      "from the manifest; absent keys commit nothing; OCC conflicts " +
      "abort") {
    val tbl = initOcc("del")
    // delete all of partition 1 (ids 1..10) plus one row of partition 2
    val victims = ((1L to 10L) :+ 14L).toDF("id")
    assert(graft.ops.TxLog.commitDelete(spark, tbl, victims, "id",
      "part") == 1)
    val v1 = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id").as[Long].collect().toSet
    assert(v1 == ((11L to 40L).toSet - 14L), s"v1 = $v1")
    // prior version still reads the full table
    assert(graft.ops.TxLog.readVersion(spark, tbl, 0).count() == 40L)
    val v1Files = graft.ops.TxLog.filesOf(tbl, 1)
    // partition 1 emptied: no files for it in the new manifest at all
    assert(!v1Files.exists(_.contains("__part=1")),
      s"emptied partition still in manifest: $v1Files")
    // partitions 3 and 4 untouched: v0 files carried by reference
    assert(v1Files.filter(f => f.contains("__part=3") ||
      f.contains("__part=4")).forall(_.startsWith("v0/")))
    // deleting keys the table no longer holds commits nothing
    assert(graft.ops.TxLog.commitDelete(spark, tbl,
      Seq(5L).toDF("id"), "id", "part") == 1)
    assert(graft.ops.TxLog.currentVersion(tbl) == 1)
    // OCC: a stale-snapshot delete overlapping a landed commit aborts
    intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitDeleteFrom(spark, tbl,
        Seq(15L).toDF("id"), "id", "part", start = 0)
    }
    // and a disjoint stale-snapshot delete lands
    assert(graft.ops.TxLog.commitDeleteFrom(spark, tbl,
      Seq(35L).toDF("id"), "id", "part", start = 1) == 2)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 2).count() == 28L)
  }

  test("OCC: a stale claim from a crashed writer fails loudly after " +
      "the timeout") {
    val tbl = initOcc("occ-stale")
    Files.write(Paths.get(s"$tbl/_vlog/v1.claim"), Array.emptyByteArray)
    val b = Seq((3L, 1, 300.0)).toDF("id", "part", "v")
    val e = intercept[IllegalStateException] {
      graft.ops.TxLog.commitUpsertFrom(spark, tbl, b, "id", "part",
        start = 0, claimTimeoutMs = 300L)
    }
    assert(e.getMessage.contains("held or stale"))
  }

  test("manifest column stats: collected per file, carried BY REFERENCE " +
      "across commits, refreshed on rewrite") {
    val root = Files.createTempDirectory("graft-txlog-stats")
    val tbl = root.resolve("t").toString
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part",
      statsCols = Seq("id", "v"))
    val e0 = graft.ops.TxLog.entriesOf(tbl, 0)
    assert(e0.size == 4 && e0.forall(_.rows == 10L))
    val p1 = e0.find(_.path.contains("__part=1")).get
    assert(p1.stats("id") == (1.0, 10.0) && p1.stats("v") == (1.0, 10.0))
    // rewrite partition 1; partitions 2-4 carry stats by reference
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part",
      statsCols = Seq("id", "v"))
    val e1 = graft.ops.TxLog.entriesOf(tbl, 1)
    val p1v1 = e1.find(_.path.contains("__part=1")).get
    assert(p1v1.path.startsWith("v1/") && p1v1.stats("v") == (1.0, 300.0))
    val p3v1 = e1.find(_.path.contains("__part=3")).get
    assert(p3v1.path.startsWith("v0/") &&
      p3v1.stats("id") == (21.0, 30.0), "carried stats lost")
  }

  test("prunedFiles skips only files whose ranges cannot match; pruned " +
      "read ≡ full read under the predicate, across versions") {
    val root = Files.createTempDirectory("graft-txlog-prune")
    val tbl = root.resolve("t").toString
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "part",
      statsCols = Seq("id"))
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part",
      statsCols = Seq("id"))
    val bounds = Seq("id" -> (12.0, 25.0))
    (0 to 1).foreach { ver =>
      val (files, total) = graft.ops.TxLog.prunedFiles(tbl, ver, bounds)
      assert(total == 4 && files.size == 2, s"v$ver: $files")
      val pruned = graft.ops.TxLog
        .readVersionPruned(spark, tbl, ver, bounds)
        .filter(col("id").between(12L, 25L))
        .select("id", "v").as[(Long, Double)].collect().toSet
      val full = graft.ops.TxLog.readVersion(spark, tbl, ver)
        .filter(col("id").between(12L, 25L))
        .select("id", "v").as[(Long, Double)].collect().toSet
      assert(pruned == full && pruned.size == 14,
        s"v$ver pruned scan diverged")
    }
    // bounds outside every range: all files pruned, empty result with
    // the snapshot's schema
    val none = graft.ops.TxLog.readVersionPruned(spark, tbl, 1,
      Seq("id" -> (999.0, 1000.0)))
    assert(none.columns.toSeq == Seq("id", "part", "v") &&
      none.count() == 0L)
    // a file without stats for the bound column is conservatively kept:
    // commit without statsCols, then prune on id
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((14L, 2, 1400.0)).toDF("id", "part", "v"), "id", "part")
    val (f2, t2) = graft.ops.TxLog.prunedFiles(tbl, 2,
      Seq("id" -> (999.0, 1000.0)))
    assert(t2 == 4 && f2.size == 1 && f2.head.contains("__part=2"),
      s"stats-less file must survive pruning: $f2")
  }

  test("commitAppend: blind appends from stale snapshots never " +
      "conflict; a later overlapping rewrite does") {
    val tbl = initOcc("append")
    val a1 = Seq((101L, 1, 101.0)).toDF("id", "part", "v")
    val a2 = Seq((102L, 1, 102.0)).toDF("id", "part", "v")
    // both appends to the SAME partition land (rows only added)
    assert(graft.ops.TxLog.commitAppend(spark, tbl, a1, "part") == 1)
    assert(graft.ops.TxLog.commitAppend(spark, tbl, a2, "part") == 2)
    val got = graft.ops.TxLog.readVersion(spark, tbl, 2)
      .filter(col("part") === 1).select("id").as[Long].collect().toSet
    assert(got == (1L to 10L).toSet ++ Set(101L, 102L))
    // partition 1 now holds v0 + two appended files
    assert(graft.ops.TxLog.filesOf(tbl, 2)
      .count(_.contains("__part=1")) == 3)
    // a rewrite prepared before the appends landed must abort: its
    // snapshot is missing appended rows in its partitions
    intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitUpsertFrom(spark, tbl,
        Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part",
        start = 0)
    }
    // and a disjoint-partition rewrite from the same stale snapshot lands
    assert(graft.ops.TxLog.commitUpsertFrom(spark, tbl,
      Seq((14L, 2, 1400.0)).toDF("id", "part", "v"), "id", "part",
      start = 0) == 3)
  }

  test("commitOptimize: data identical, files compacted, prior " +
      "versions readable; conflicts like any rewrite") {
    val tbl = initOcc("opt")
    graft.ops.TxLog.commitAppend(spark, tbl,
      Seq((101L, 1, 101.0), (102L, 2, 102.0)).toDF("id", "part", "v"),
      "part")
    assert(graft.ops.TxLog.filesOf(tbl, 1).size == 6)
    val before = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id", "v").as[(Long, Double)].collect().toSet
    // optimize everything, z-clustered on (id, part), stats refreshed
    assert(graft.ops.TxLog.commitOptimize(spark, tbl, "part",
      zorder = Seq("id", "part"), statsCols = Seq("id")) == 2)
    val e2 = graft.ops.TxLog.entriesOf(tbl, 2)
    assert(e2.size == 4 && e2.forall(_.path.startsWith("v2/")),
      s"expected one compacted file per partition: ${e2.map(_.path)}")
    assert(e2.find(_.path.contains("__part=1")).get.stats("id") ==
      (1.0, 101.0))
    val after = graft.ops.TxLog.readVersion(spark, tbl, 2)
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(after == before, "OPTIMIZE changed the data")
    assert(graft.ops.TxLog.readVersion(spark, tbl, 1).count() == 42L)
    // OPTIMIZE vs overlapping upsert: the stale one aborts retryably
    intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitUpsertFrom(spark, tbl,
        Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part",
        start = 1)
    }
    // a stale OPTIMIZE overlapping a landed upsert also aborts
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part")
    intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitOptimizeFrom(spark, tbl, "part", None, Nil,
        Nil, start = 2)
    }
    // partition-scoped optimize from the same stale snapshot, disjoint
    // from the upsert's partition 1: lands
    assert(graft.ops.TxLog.commitOptimizeFrom(spark, tbl, "part",
      Some(Set("2")), Nil, Nil, start = 2) == 4)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 4)
      .select("id", "v").as[(Long, Double)].collect().toSet ==
      before - ((3L, 3.0)) + ((3L, 300.0)))
  }

  test("vacuum never touches an in-flight commit: stage dirs survive " +
      "by default, head references stay; staleStageMs sweeps orphans") {
    val tbl = initOcc("vac-stage")
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part")
    // simulate an in-flight writer mid-stage
    val staged = Paths.get(s"$tbl/stage-deadbeef")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-00000.parquet"), Array[Byte](1, 2))
    graft.ops.TxLog.vacuum(spark, tbl, 1)
    assert(Files.exists(staged), "vacuum swept a live stage dir")
    // head version still fully readable after the vacuum
    assert(graft.ops.TxLog.readVersion(spark, tbl, 1).count() == 40L)
    // explicit orphan sweep removes it
    graft.ops.TxLog.vacuum(spark, tbl, 1, staleStageMs = 0L)
    assert(!Files.exists(staged), "orphan sweep missed the stage dir")
  }

  test("commitUpsertEvolve: batch adds a column — touched partitions " +
      "rewrite under the union schema, untouched old-schema files " +
      "carry by reference, prior versions keep the old schema") {
    val tbl = initOcc("evolve")
    val batch = Seq((3L, 1, 300.0, "erp"), (41L, 5, 4100.0, "erp"))
      .toDF("id", "part", "v", "src")
    assert(graft.ops.TxLog.commitUpsertEvolve(spark, tbl, batch, "id",
      "part") == 1)
    val v1 = graft.ops.TxLog.readVersion(spark, tbl, 1)
    assert(v1.columns.toSet == Set("id", "part", "v", "src"))
    val got = v1.select(col("id"), col("v"), col("src"))
      .as[(Long, Double, Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(3L) == ((300.0, Some("erp"))) &&
      got(41L) == ((4100.0, Some("erp"))))
    // untouched rows present the evolved schema with nulls
    assert(got(14L) == ((14.0, None)) && got.size == 41)
    // untouched partitions' files carried by reference (old schema)
    assert(graft.ops.TxLog.filesOf(tbl, 1)
      .exists(f => f.startsWith("v0/") && f.contains("__part=2")))
    // time travel: v0 still presents the PRE-evolution schema
    assert(graft.ops.TxLog.readVersion(spark, tbl, 0)
      .columns.toSet == Set("id", "part", "v"))
    // and a second evolve round-trips through the mixed-schema base
    assert(graft.ops.TxLog.commitUpsertEvolve(spark, tbl,
      Seq((14L, 2, 1400.0, "mq")).toDF("id", "part", "v", "src"),
      "id", "part") == 2)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 2)
      .filter(col("id") === 14L).select(col("src")).as[String]
      .collect().toSeq == Seq("mq"))
  }

  test("commitDeleteMor: O(batch) delete file, zero base writes; " +
      "version-ordered application lets a later append re-ingest; " +
      "purge folds and is partition-pruned") {
    val tbl = initOcc("mor")
    val v0Data = graft.ops.TxLog.entriesOf(tbl, 0)
    // delete ids 3, 7 (partition 1) via ONE equality-delete file
    assert(graft.ops.TxLog.commitDeleteMor(spark, tbl,
      Seq(3L, 7L).toDF("id"), "id") == 1)
    val e1 = graft.ops.TxLog.entriesOf(tbl, 1)
    assert(e1.filter(_.kind == "data") == v0Data,
      "a MoR delete must not touch a single base file")
    assert(e1.count(_.kind == "dv") == 1)
    val v1 = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id").as[Long].collect().toSet
    assert(v1 == (1L to 40L).toSet -- Set(3L, 7L))
    // prior version still shows the victims
    assert(graft.ops.TxLog.readVersion(spark, tbl, 0).count() == 40L)
    // a later append RE-INGESTS id 3: newer than the delete → survives
    graft.ops.TxLog.commitAppend(spark, tbl,
      Seq((3L, 1, 333.0)).toDF("id", "part", "v"), "part")
    val v2 = graft.ops.TxLog.readVersion(spark, tbl, 2)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(v2.get(3L).contains(333.0) && !v2.contains(7L) &&
      v2.size == 39)
    // a rewrite prepared BEFORE the delete landed aborts retryably
    intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitUpsertFrom(spark, tbl,
        Seq((14L, 2, 1400.0)).toDF("id", "part", "v"), "id", "part",
        start = 0)
    }
    // a fresh-snapshot upsert of partition 1 does NOT resurrect id 7
    // (its base read is MoR-aware)
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((5L, 1, 500.0)).toDF("id", "part", "v"), "id", "part")
    val v3 = graft.ops.TxLog.readVersion(spark, tbl, 3)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(!v3.contains(7L) && v3(5L) == 500.0 && v3(3L) == 333.0)
    // purge: id-7's delete now only matters for partition 1 — but the
    // v3 upsert already rewrote partition 1 MoR-aware, so the delete
    // matches nothing; the purge commits a manifest without it
    assert(graft.ops.TxLog.commitPurgeMor(spark, tbl, "part") == 4)
    assert(graft.ops.TxLog.entriesOf(tbl, 4).forall(_.kind == "data"))
    assert(graft.ops.TxLog.readVersion(spark, tbl, 4)
      .select("id", "v").as[(Long, Double)].collect().toMap == v3)
  }

  test("commitPurgeMor rewrites only the victims' partitions; a " +
      "whole-table OPTIMIZE folds deletes too") {
    val tbl = initOcc("mor2")
    graft.ops.TxLog.commitDeleteMor(spark, tbl,
      Seq(14L, 15L).toDF("id"), "id") // partition 2 only
    assert(graft.ops.TxLog.commitPurgeMor(spark, tbl, "part",
      statsCols = Seq("id")) == 2)
    val e2 = graft.ops.TxLog.entriesOf(tbl, 2)
    assert(e2.forall(_.kind == "data"))
    // partitions 1, 3, 4 carried by reference from v0
    assert(e2.count(_.path.startsWith("v0/")) == 3)
    assert(e2.find(_.path.contains("__part=2")).get.path.startsWith("v2/"))
    assert(graft.ops.TxLog.readVersion(spark, tbl, 2)
      .select("id").as[Long].collect().toSet ==
      (1L to 40L).toSet -- Set(14L, 15L))
    // second round: delete + whole-table optimize folds AND drops dels
    graft.ops.TxLog.commitDeleteMor(spark, tbl, Seq(22L).toDF("id"), "id")
    val vOpt = graft.ops.TxLog.commitOptimize(spark, tbl, "part")
    assert(graft.ops.TxLog.entriesOf(tbl, vOpt).forall(_.kind == "data"))
    assert(graft.ops.TxLog.readVersion(spark, tbl, vOpt)
      .select("id").as[Long].collect().toSet ==
      (1L to 40L).toSet -- Set(14L, 15L, 22L))
    // and the pruned read applies deletes: id 22's file band still
    // matches the bounds, but the row must not appear
    graft.ops.TxLog.commitDeleteMor(spark, tbl, Seq(23L).toDF("id"), "id")
    val pruned = graft.ops.TxLog.readVersionPruned(spark, tbl,
        graft.ops.TxLog.currentVersion(tbl), Seq("id" -> (21.0, 25.0)))
      .select("id").as[Long].collect().toSet
    assert(!pruned.contains(23L) && pruned.contains(24L),
      s"pruned MoR read wrong: $pruned")
    // tableChanges across the delete-only commit (reference diff can't
    // prune — the delete has no footprint) reports exactly the D row
    val chg = graft.ops.TxLog.tableChanges(spark, tbl, vOpt, vOpt + 1,
        "id", Seq("v"))
      .select("op", "id").as[(String, Long)].collect().toSet
    assert(chg == Set(("D", 23L)), s"got $chg")
  }

  test("MoR delete-set size gate: the broadcast and shuffle-hash " +
      "paths read identically (unknown-size entries take the big path)") {
    val tbl = initOcc("mor-gate")
    graft.ops.TxLog.commitDeleteMor(spark, tbl,
      Seq(3L, 14L, 25L).toDF("id"), "id")
    // small path: the manifest carries the key count
    val e = graft.ops.TxLog.entriesOf(tbl, 1).find(_.kind == "dv").get
    assert(e.rows == 3L, s"delete entry must record its key count: $e")
    val smallRead = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id", "v").as[(Long, Double)].collect().toSet
    // force the big path via the documented legacy codec: rows = -1
    // (unknown) is conservatively treated as over-budget
    val mf = Paths.get(s"$tbl/_vlog/v1.json")
    val body = new String(Files.readAllBytes(mf), "UTF-8")
    val edited = body.replace(s"\t${e.rows}\t\tdv", "\t-1\t\tdv")
    assert(edited != body, "manifest edit missed the dv line")
    Files.write(mf, edited.getBytes("UTF-8"))
    assert(graft.ops.TxLog.entriesOf(tbl, 1)
      .find(_.kind == "dv").get.rows == -1L)
    val bigRead = graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(bigRead == smallRead && smallRead.size == 37,
      "the two delete-join paths diverged")
  }

  test("readAppendsSince: exactly the appended rows, MoR-applied; " +
      "rewrites refuse without allowRewrites") {
    val tbl = initOcc("appsince")
    graft.ops.TxLog.commitAppend(spark, tbl,
      Seq((101L, 1, 101.0), (102L, 2, 102.0)).toDF("id", "part", "v"),
      "part")
    graft.ops.TxLog.commitAppend(spark, tbl,
      Seq((103L, 1, 103.0)).toDF("id", "part", "v"), "part")
    val got = graft.ops.TxLog.readAppendsSince(spark, tbl, 0)
      .select("id").as[Long].collect().toSet
    assert(got == Set(101L, 102L, 103L))
    assert(graft.ops.TxLog.readAppendsSince(spark, tbl, 1)
      .select("id").as[Long].collect().toSet == Set(103L))
    assert(graft.ops.TxLog.readAppendsSince(spark, tbl, 2).count() == 0L)
    // a MoR delete newer than an append masks it in the incremental read
    graft.ops.TxLog.commitDeleteMor(spark, tbl, Seq(102L).toDF("id"),
      "id")
    assert(graft.ops.TxLog.readAppendsSince(spark, tbl, 0)
      .select("id").as[Long].collect().toSet == Set(101L, 103L))
    // a rewrite breaks the appends-only contract loudly
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part")
    val e = intercept[IllegalStateException] {
      graft.ops.TxLog.readAppendsSince(spark, tbl, 0)
    }
    assert(e.getMessage.contains("allowRewrites"))
    // and the escape hatch re-emits the surviving rewritten partition
    val re = graft.ops.TxLog.readAppendsSince(spark, tbl, 0,
      allowRewrites = true).select("id").as[Long].collect().toSet
    assert(re.contains(3L) && re.contains(101L) && !re.contains(102L))
  }

  test("partition-spec evolution: OPTIMIZE re-partitions under a new " +
      "column; old versions time-travel, cross-spec rewrites conflict") {
    val root = Files.createTempDirectory("graft-txlog-spec")
    val tbl = root.resolve("t").toString
    // two candidate partitioning columns: day (initial spec), region
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1,
      if (i % 2 == 0) "eu" else "us", i * 1.0))
      .toDF("id", "day", "region", "v")
    graft.ops.TxLog.commitInitial(spark, tbl, base, "day")
    assert(graft.ops.TxLog.filesOf(tbl, 0)
      .forall(_.contains("__part=")))
    // re-partition the WHOLE table by region — an OPTIMIZE under the
    // new spec (every old partition is touched, so the commit replaces
    // the full file set)
    assert(graft.ops.TxLog.commitOptimize(spark, tbl, "region",
      partitions = None, statsCols = Seq("id")) == 1)
    val e1 = graft.ops.TxLog.filesOf(tbl, 1)
    assert(e1.size == 2 && e1.forall(f =>
      f.contains("__part=eu") || f.contains("__part=us")), s"$e1")
    // data identical, both versions readable
    assert(graft.ops.TxLog.readVersion(spark, tbl, 1)
      .select("id", "v").as[(Long, Double)].collect().toSet ==
      base.select("id", "v").as[(Long, Double)].collect().toSet)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 0).count() == 40L)
    // upserts under the NEW spec work; a stale OLD-spec rewrite aborts
    // (the re-spec commit touched every old partition)
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, "us", 300.0)).toDF("id", "day", "region", "v"),
      "id", "region")
    assert(graft.ops.TxLog.readVersion(spark, tbl, 2)
      .filter(col("id") === 3L).select("v").as[Double]
      .collect().toSeq == Seq(300.0))
    intercept[graft.ops.TxLog.CommitConflictException] {
      graft.ops.TxLog.commitUpsertFrom(spark, tbl,
        Seq((14L, 2, "eu", 1400.0)).toDF("id", "day", "region", "v"),
        "id", "day", start = 0)
    }
  }

  test("versionAsOf resolves TIMESTAMP AS OF from manifest mtimes") {
    val tbl = initOcc("asof")
    val t0 = System.currentTimeMillis()
    assert(graft.ops.TxLog.versionAsOf(tbl, t0) == 0)
    Thread.sleep(30) // mtime granularity guard
    graft.ops.TxLog.commitUpsert(spark, tbl,
      Seq((3L, 1, 300.0)).toDF("id", "part", "v"), "id", "part")
    assert(graft.ops.TxLog.versionAsOf(tbl, t0) == 0,
      "a later commit leaked into the past")
    assert(graft.ops.TxLog.versionAsOf(tbl,
      System.currentTimeMillis()) == 1)
    assert(graft.ops.TxLog.versionAsOf(tbl, 0L) == -1)
  }

  test("commitDelete on an emptied snapshot is a no-op, not a crash") {
    val root = Files.createTempDirectory("graft-txlog-empty")
    val tbl = root.resolve("t").toString
    graft.ops.TxLog.commitInitial(spark, tbl,
      Seq((1L, 1, 1.0)).toDF("id", "part", "v"), "part")
    // delete the only row: v1's manifest has zero files
    assert(graft.ops.TxLog.commitDelete(spark, tbl, Seq(1L).toDF("id"),
      "id", "part") == 1)
    assert(graft.ops.TxLog.filesOf(tbl, 1).isEmpty)
    assert(graft.ops.TxLog.readVersion(spark, tbl, 1).count() == 0L)
    // deleting from the empty snapshot commits nothing
    assert(graft.ops.TxLog.commitDelete(spark, tbl, Seq(1L).toDF("id"),
      "id", "part") == 1)
    assert(graft.ops.TxLog.currentVersion(tbl) == 1)
  }

  test("commitInitialFrom clones a staged snapshot into an identical " +
      "v0; footer-sourced stats ≡ a distributed scan (nulls, all-null, " +
      "and encoded-logical-type fallback included)") {
    val root = Files.createTempDirectory("graft-txlog")
    // maybe: some nulls (footer min/max over non-nulls); dead: all-null
    // (no range — un-prunable, same as the scan-based behavior)
    val df = (1 to 40).map { i =>
      (i.toLong, (i - 1) / 10 + 1, i * 1.5,
        if (i % 3 == 0) None else Some(i * 2.0),
        None: Option[Double])
    }.toDF("id", "part", "v", "maybe", "dead")
    val stats = Seq("id", "v", "maybe", "dead")
    val tblA = root.resolve("a").toString
    val tblB = root.resolve("b").toString
    val staged = root.resolve("staged").toString
    assert(graft.ops.TxLog.commitInitial(spark, tblA, df, "part",
      statsCols = stats) == 0)
    graft.ops.TxLog.stageInitial(spark, staged, df, "part")
    assert(graft.ops.TxLog.commitInitialFrom(spark, tblB, staged,
      statsCols = stats) == 0)
    def byPart(tbl: String) = graft.ops.TxLog.entriesOf(tbl, 0)
      .groupBy(_.path.split('/').find(_.startsWith("__part=")).get)
      .view.mapValues(es =>
        (es.map(_.rows).sum, es.flatMap(_.stats).toMap)).toMap
    val a = byPart(tblA)
    val b = byPart(tblB)
    assert(a == b, s"clone manifest stats diverge: $a vs $b")
    // both must equal a fresh distributed computation per partition
    (1 to 4).foreach { p =>
      val rows = df.filter(col("part") === p)
      val r = rows.agg(count(lit(1)),
        min(col("id").cast("double")), max(col("id").cast("double")),
        min(col("v")), max(col("v")),
        min(col("maybe")), max(col("maybe"))).collect()(0)
      val (n, st) = a(s"__part=$p")
      assert(n == r.getLong(0))
      assert(st("id") == (r.getDouble(1), r.getDouble(2)))
      assert(st("v") == (r.getDouble(3), r.getDouble(4)))
      assert(st("maybe") == (r.getDouble(5), r.getDouble(6)))
      assert(!st.contains("dead"), "all-null column must have no range")
    }
    // clone reads identically
    assert(graft.ops.TxLog.readVersion(spark, tblB, 0)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet ==
      df.select(col("id"), col("v")).as[(Long, Double)].collect().toSet)
    // an encoded logical type (timestamp) cannot be trusted from the
    // footer — the per-file scan fallback must produce the cast values
    val tdf = Seq((1L, 1, java.sql.Timestamp.valueOf("2020-01-02 00:00:00")),
      (2L, 1, java.sql.Timestamp.valueOf("2020-01-05 00:00:00")))
      .toDF("id", "part", "ts")
    val tblT = root.resolve("t").toString
    assert(graft.ops.TxLog.commitInitial(spark, tblT, tdf, "part",
      statsCols = Seq("id", "ts")) == 0)
    val tr = tdf.agg(min(col("ts").cast("double")),
      max(col("ts").cast("double"))).collect()(0)
    val tst = graft.ops.TxLog.entriesOf(tblT, 0).head.stats
    assert(tst("ts") == (tr.getDouble(0), tr.getDouble(1)),
      s"timestamp stats must come from the scan fallback, got $tst")
  }
}
