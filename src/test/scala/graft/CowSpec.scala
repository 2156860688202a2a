package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (ops/Cow.scala): the write-side guarantee the
  * q111 hash gate cannot see — untouched partitions' FILES must come
  * through the merge byte-identical (not rewritten, not re-staged),
  * while touched partitions hold exactly the upsert result.
  */
class CowSpec extends SparkSpec {

  private def md5OfFiles(root: Path): Map[String, String] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map { p =>
        val d = MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(p))
        root.relativize(p).toString -> d.map("%02x".format(_)).mkString
      }.toMap

  test("mergeCow rewrites ONLY touched partitions — untouched files " +
      "byte-identical, touched partitions hold the exact upsert") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow")
    val tbl = root.resolve("t").toString
    // 4 partitions × 10 keys
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    base.repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))
    assert(before.nonEmpty)

    // batch touches parts 1 and 2 only: update ids 3, 14; insert id 99
    val batch = Seq((3L, 1, 300.0), (14L, 2, 1400.0), (99L, 1, 9900.0))
      .toDF("id", "part", "v")
    val touched = graft.ops.Cow.mergeCow(spark, tbl, batch, "id", "part")
    assert(touched.toSet == Set(1, 2))

    val after = md5OfFiles(Paths.get(tbl))
    val untouchedBefore = before.filter { case (p, _) =>
      p.startsWith("part=3") || p.startsWith("part=4") }
    val untouchedAfter = after.filter { case (p, _) =>
      p.startsWith("part=3") || p.startsWith("part=4") }
    assert(untouchedBefore == untouchedAfter,
      "untouched partitions' files changed (paths or bytes)")
    // touched partitions were actually rewritten (fresh file names)
    assert(after.keySet.filter(_.startsWith("part=1")) !=
      before.keySet.filter(_.startsWith("part=1")))

    // value semantics: the read-back equals the global upsert replay
    val got = spark.read.parquet(tbl)
      .select(col("id"), col("part").cast("int").as("part"), col("v"))
      .as[(Long, Int, Double)].collect().toSet
    val want = (1 to 40).filterNot(i => i == 3 || i == 14)
      .map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0)).toSet ++
      Set((3L, 1, 300.0), (14L, 2, 1400.0), (99L, 1, 9900.0))
    assert(got == want)
  }

  test("deleteCow purges keys, rewrites only key-bearing partitions, " +
      "and removes a fully-emptied partition's directory") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow3")
    val tbl = root.resolve("t").toString
    // parts 1..4, ids 1..40; part 4 will be deleted WHOLESALE
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    base.repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))
    // doomed keys: two ids in part 1, ALL of part 4; parts 2-3 untouched
    val doomed = (Seq(3L, 7L) ++ (31L to 40L)).toDF("id")
    val touched = graft.ops.Cow.deleteCow(spark, tbl, doomed, "id",
      "part")
    assert(touched.toSet == Set(1, 4))
    val after = md5OfFiles(Paths.get(tbl))
    val untouched = (m: Map[String, String]) => m.filter { case (p, _) =>
      p.startsWith("part=2") || p.startsWith("part=3") }
    assert(untouched(before) == untouched(after),
      "untouched partitions' files changed")
    // the emptied partition's directory is GONE (the dynamic-overwrite
    // pitfall: no output rows for part=4 means the staged swap would
    // have left its old files in place)
    assert(!Files.exists(Paths.get(s"$tbl/part=4")),
      "fully-deleted partition directory survived")
    val got = spark.read.parquet(tbl).select(col("id")).as[Long]
      .collect().toSet
    assert(got == (1L to 30L).toSet -- Set(3L, 7L))
  }

  test("deleteCow removes an emptied partition whose value needs " +
      "path escaping") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow5")
    val tbl = root.resolve("t").toString
    // 'a b' is written by Spark as part=a%20b — a raw interpolation of
    // the value would target a nonexistent dir and silently leave the
    // files (resurrecting the deleted rows)
    Seq((1L, "a b", 1.0), (2L, "a b", 2.0), (3L, "plain", 3.0))
      .toDF("id", "part", "v")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    graft.ops.Cow.deleteCow(spark, tbl, Seq(1L, 2L).toDF("id"), "id",
      "part")
    assert(!Files.exists(Paths.get(s"$tbl/part=a%20b")),
      "escaped emptied partition directory survived")
    val got = spark.read.parquet(tbl).select(col("id")).as[Long]
      .collect().toSet
    assert(got == Set(3L), s"deleted rows resurrected: $got")
  }

  test("deleteCow with no matching keys touches nothing") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow4")
    val tbl = root.resolve("t").toString
    (1 to 10).map(i => (i.toLong, i % 2, i * 1.0)).toDF("id", "part", "v")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))
    val touched = graft.ops.Cow.deleteCow(spark, tbl,
      Seq(999L).toDF("id"), "id", "part")
    assert(touched.isEmpty)
    assert(md5OfFiles(Paths.get(tbl)) == before)
  }

  test("applyChangelog applies I/U/D last-writer-wins in one pass, " +
      "including an I+U+D landing on the SAME key in one batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow5")
    val tbl = root.resolve("t").toString
    // 4 partitions × 10 keys
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    base.repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))

    // one Debezium-shaped batch:
    //  - key 3 (part 1): U             → updated
    //  - key 14 (part 2): U then D     → deleted (last writer wins)
    //  - key 99 (part 1): I, U, D      → net delete of a key base never
    //    had — must be a no-op on base rows
    //  - key 77 (part 2): I then U     → inserted with the U payload
    //  - key 25 (part 3): D            → deleted (a D row carries no
    //    partition value — its location is discovered from base)
    val log = Seq(
      ("U", 2L, 3L, Some(1), 300.0),
      ("U", 1L, 14L, Some(2), 9999.0),
      ("D", 2L, 14L, None, 0.0),
      ("I", 1L, 99L, Some(1), 1.0),
      ("U", 2L, 99L, Some(1), 2.0),
      ("D", 3L, 99L, None, 0.0),
      ("I", 1L, 77L, Some(2), 7.0),
      ("U", 2L, 77L, Some(2), 77.0),
      ("D", 1L, 25L, None, 0.0)
    ).toDF("op", "seq", "id", "part", "v")
    val touched = graft.ops.Cow.applyChangelog(spark, tbl, log,
      "id", "part", "op", "seq")
    assert(touched.toSet == Set(1, 2, 3))

    val got = spark.read.parquet(tbl)
      .select(col("id"), col("part").cast("int").as("part"), col("v"))
      .as[(Long, Int, Double)].collect().toSet
    val want = (1 to 40).filterNot(i => i == 3 || i == 14 || i == 25)
      .map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0)).toSet ++
      Set((3L, 1, 300.0), (77L, 2, 77.0))
    assert(got == want)

    // part=4 saw no op — its files must come through byte-identical
    val b4 = before.filter(_._1.startsWith("part=4"))
    val a4 = md5OfFiles(Paths.get(tbl)).filter(_._1.startsWith("part=4"))
    assert(b4 == a4, "untouched partition's files changed")
  }

  test("applyChangelog removes a partition emptied purely by deletes") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow6")
    val tbl = root.resolve("t").toString
    Seq((1L, 1, 1.0), (2L, 1, 2.0), (3L, 2, 3.0))
      .toDF("id", "part", "v")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val log = Seq(("D", 1L, 1L, Option.empty[Int], 0.0),
      ("D", 1L, 2L, Option.empty[Int], 0.0))
      .toDF("op", "seq", "id", "part", "v")
    val touched = graft.ops.Cow.applyChangelog(spark, tbl, log,
      "id", "part", "op", "seq")
    assert(touched.toSet == Set(1))
    assert(!Files.exists(Paths.get(tbl, "part=1")),
      "emptied partition directory survived — rows would resurrect")
    assert(spark.read.parquet(tbl).select(col("id")).as[Long]
      .collect().toSeq == Seq(3L))
  }

  test("mergeCowEvolve: untouched partitions keep old files AND old " +
      "schema byte-identical; mergeSchema read NULL-backfills") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow-ev")
    val tbl = root.resolve("t").toString
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    base.repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))
    // the batch carries a NEW column; touches parts 1 and 2
    val batch = Seq((3L, 1, 300.0, "late"), (99L, 2, 9900.0, "backfill"))
      .toDF("id", "part", "v", "reason")
    val touched = graft.ops.Cow.mergeCowEvolve(spark, tbl, batch,
      "id", "part")
    assert(touched.toSet == Set(1, 2))
    val after = md5OfFiles(Paths.get(tbl))
    val untouchedBefore = before.filter(p =>
      p._1.startsWith("part=3") || p._1.startsWith("part=4"))
    assert(untouchedBefore.nonEmpty &&
      untouchedBefore.forall { case (k, h) => after.get(k).contains(h) },
      "untouched partition files changed")
    // old-schema files in untouched partitions: reading one directly
    // must NOT know the new column
    assert(!spark.read.parquet(s"$tbl/part=3").columns.contains("reason"))
    val all = spark.read.option("mergeSchema", "true").parquet(tbl)
    val got = all.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      (r.getDouble(r.fieldIndex("v")),
        Option(r.get(r.fieldIndex("reason"))))).toMap
    assert(got(3L) == ((300.0, Some("late"))))   // upserted
    assert(got(99L) == ((9900.0, Some("backfill")))) // inserted
    assert(got(14L) == ((14.0, None)))  // touched-partition survivor
    assert(got(35L) == ((35.0, None)))  // untouched partition
    assert(got.size == 41)
  }

  test("mergeCowWhen: conditional update applies, stale replay leaves " +
      "the target, matched delete removes, insert lands; untouched " +
      "partitions byte-identical; emptied partition removed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow-when")
    val tbl = root.resolve("t").toString
    // parts 1..4; `seq` is the version the conditions compare
    (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i.toLong, i * 1.0))
      .toDF("id", "part", "seq", "v")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))
    val batch = Seq(
      (3L, 1, 10L, 300.0),   // newer seq → update applies
      (5L, 1, 1L, 500.0),    // STALE (seq 1 < 5) → target survives
      (14L, 2, 99L, -1.0),   // delete condition (v < 0 marks purge)
      (99L, 1, 1L, 990.0)    // unmatched → insert
    ).toDF("id", "part", "seq", "v")
    val touched = graft.ops.Cow.mergeCowWhen(spark, tbl, batch,
      "id", "part",
      updateWhen = (t, s) => s("seq") > t("seq"),
      deleteWhen = (_, s) => s("v") < 0)
    assert(touched.toSet == Set(1, 2))
    val after = md5OfFiles(Paths.get(tbl))
    val untouchedBefore = before.filter(p =>
      p._1.startsWith("part=3") || p._1.startsWith("part=4"))
    assert(untouchedBefore.nonEmpty &&
      untouchedBefore.forall { case (k, h) => after.get(k).contains(h) },
      "untouched partition files changed")
    val got = spark.read.parquet(tbl).collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        (r.getLong(r.fieldIndex("seq")),
          r.getDouble(r.fieldIndex("v")))).toMap
    assert(got(3L) == ((10L, 300.0)), "conditional update not applied")
    assert(got(5L) == ((5L, 5.0)), "stale replay overwrote the target")
    assert(!got.contains(14L), "matched delete survived")
    assert(got(99L) == ((1L, 990.0)), "insert missing")
    assert(got.size == 40) // 40 - 1 delete + 1 insert
    // a purge batch that empties an entire partition removes its dir
    val purgeAll = (31 to 40).map(i => (i.toLong, 4, 999L, -1.0))
      .toDF("id", "part", "seq", "v")
    val t2 = graft.ops.Cow.mergeCowWhen(spark, tbl, purgeAll,
      "id", "part",
      updateWhen = (t, s) => s("seq") > t("seq"),
      deleteWhen = (_, s) => s("v") < 0)
    assert(t2 == Seq(4))
    assert(!Files.exists(Paths.get(s"$tbl/part=4")),
      "emptied partition directory survived")
    assert(spark.read.parquet(tbl).count() == 30L)
  }

  test("mergeCowEvolve twice: the SECOND evolution keeps the first " +
      "one's column (mergeSchema base read — round-14 advice)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow-ev2")
    val tbl = root.resolve("t").toString
    (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    // evolution 1 touches ONLY part 1, adding `reason`
    graft.ops.Cow.mergeCowEvolve(spark,
      tbl, Seq((3L, 1, 300.0, "late")).toDF("id", "part", "v", "reason"),
      "id", "part")
    // evolution 2 touches part 1 again with a DIFFERENT new column.
    // Pre-fix, the un-merged base read could infer a schema without
    // `reason` (heterogeneous partitions), silently dropping row 3's
    // value; the require below it would also not demand `reason` in the
    // batch. Post-fix the union schema is authoritative, so the batch
    // must carry it.
    val b2 = Seq((5L, 1, 500.0, null.asInstanceOf[String], 7L))
      .toDF("id", "part", "v", "reason", "score")
    graft.ops.Cow.mergeCowEvolve(spark, tbl, b2, "id", "part")
    val all = spark.read.option("mergeSchema", "true").parquet(tbl)
    val got = all.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      (Option(r.get(r.fieldIndex("reason"))),
        Option(r.get(r.fieldIndex("score"))))).toMap
    assert(got(3L) == ((Some("late"), None)),
      "first evolution's column lost by the second evolve")
    assert(got(5L) == ((None, Some(7L))))
    assert(got(1L) == ((None, None)))   // pre-evolution survivor
    assert(got.size == 40)
    // and a batch MISSING the evolved column now fails loudly instead
    // of silently dropping it
    val missing = intercept[IllegalArgumentException] {
      graft.ops.Cow.mergeCowEvolve(spark,
        tbl, Seq((6L, 1, 600.0)).toDF("id", "part", "v"), "id", "part")
    }
    assert(missing.getMessage.contains("reason"))
  }

  test("extract ∘ apply round-trips: applyChangelog(v0, cdcExtract" +
      "(v0, v1)) == v1") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdc-rt")
    val tbl = root.resolve("t").toString
    val v0 = (1 to 30).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    v0.repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    // v1: delete ids % 7 == 0, update ids % 5 == 0, insert 100..102
    val v1 = v0.filter(col("id") % 7 =!= 0)
      .withColumn("v", when(col("id") % 5 === 0, col("v") + 1000.0)
        .otherwise(col("v")))
      .unionByName(Seq((100L, 1, 1.5), (101L, 2, 2.5), (102L, 9, 3.5))
        .toDF("id", "part", "v")) // part 9: an insert creates a NEW dir
    val feed = graft.ops.TimeSeries.cdcExtract(v0, v1, "id",
      Seq("part", "v"))
    // the extracted feed is MINIMAL: unchanged keys never appear
    val ops = feed.groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops("D") == 4L && ops("I") == 3L,
      s"unexpected feed shape $ops") // 7,14,21,28 deleted; 3 inserts
    assert(!feed.filter(col("op") === "U")
      .join(v0.withColumnRenamed("v", "v0"), Seq("id"))
      .filter(col("v") === col("v0")).limit(1).collect().nonEmpty,
      "a no-op row leaked into the feed")
    graft.ops.Cow.applyChangelog(spark, tbl,
      feed.withColumn("seq", lit(1L)), "id", "part", "op", "seq")
    val got = spark.read.parquet(tbl).select("id", "part", "v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSet
    val want = v1.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want, "round trip diverged")
  }

  test("mergeCow prunes the base read to the touched partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cow2")
    val tbl = root.resolve("t").toString
    (1 to 20).map(i => (i.toLong, i % 2, i * 1.0)).toDF("id", "part", "v")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    // the IN-list partition filter is static: a scan of the base
    // restricted to part=0 must report exactly one partition
    val pruned = spark.read.parquet(tbl).filter(col("part").isin(0))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scan.nonEmpty)
    assert(scan.head.metrics("numPartitions").value == 1,
      "touched-partition read not pruned")
  }
}
