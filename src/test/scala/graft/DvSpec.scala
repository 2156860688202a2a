package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Deletion vectors (ops/Dv.scala): merge-on-read DELETE. The q143 hash
  * gate proves the MoR snapshot's VALUES; this spec proves the write
  * guarantees — a DV delete touches zero base files, the MoR read
  * equals the eager rewrite, and purge folds the tombstones without
  * changing the snapshot.
  */
class DvSpec extends SparkSpec {

  private def md5OfFiles(root: Path): Map[String, String] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.toString.contains("_dv") &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map { p =>
        val d = MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(p))
        root.relativize(p).toString -> d.map("%02x".format(_)).mkString
      }.toMap

  test("DV delete touches ZERO base files; MoR read equals the eager " +
      "deleteCow; purge folds tombstones and preserves the snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dv")
    val tblA = root.resolve("a").toString // DV path
    val tblB = root.resolve("b").toString // eager path
    val base = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
    Seq(tblA, tblB).foreach { t =>
      base.repartition(col("part"))
        .write.mode("overwrite").partitionBy("part").parquet(t)
    }
    val before = md5OfFiles(Paths.get(tblA))
    assert(before.nonEmpty)

    // two accumulating delete batches
    val d1 = Seq(3L, 14L).toDF("id")
    val d2 = Seq(14L, 27L).toDF("id") // 14 twice: idempotent tombstone
    graft.ops.Dv.delete(spark, tblA, d1, "id")
    graft.ops.Dv.delete(spark, tblA, d2, "id")
    // zero base files touched — byte-identical, nothing added/removed
    assert(md5OfFiles(Paths.get(tblA)) == before,
      "a DV delete rewrote base files")
    val (nDv, nBase) = graft.ops.Dv.stats(spark, tblA, "id")
    assert(nDv == 4L && nBase == 40L) // appended slabs, dup kept

    // MoR read == eager deleteCow result
    graft.ops.Cow.deleteCow(spark, tblB, d1.union(d2), "id", "part")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "part", "v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val mor = snap(graft.ops.Dv.read(spark, tblA, "id"))
    assert(mor == snap(spark.read.parquet(tblB)))
    assert(!mor.exists(t => Set(3L, 14L, 27L).contains(t._1)))

    // purge: touched partitions = the key-bearing ones (1: id 3; 2: id
    // 14; 3: id 27), _dv/ cleared, plain read == the prior MoR snapshot
    val touched = graft.ops.Dv.purge(spark, tblA, "id", "part")
    assert(touched.toSet == Set(1, 2, 3), s"purge touched $touched")
    assert(!Files.exists(Paths.get(s"$tblA/_dv")), "_dv survived purge")
    assert(snap(spark.read.parquet(tblA)) == mor)
    assert(graft.ops.Dv.stats(spark, tblA, "id") == ((0L, 37L)))
    // a second purge is a no-op
    assert(graft.ops.Dv.purge(spark, tblA, "id", "part").isEmpty)
  }

  test("MoR read on a table with no deletes reads the base unmodified") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dv2")
    val tbl = root.resolve("t").toString
    (1 to 10).map(i => (i.toLong, 1, i * 1.0)).toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    assert(graft.ops.Dv.read(spark, tbl, "id").count() == 10L)
  }

  test("size gate: an oversized DV falls back to a SHUFFLE anti join " +
      "with the same result; the gate keeps the broadcast otherwise") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dv3")
    val tbl = root.resolve("t").toString
    (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    graft.ops.Dv.delete(spark, tbl,
      Seq(3L, 14L, 27L).toDF("id"), "id")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val small = graft.ops.Dv.read(spark, tbl, "id") // default gate
    assert(planOf(small).contains("BroadcastHashJoin"),
      "in-regime DV should broadcast")
    val big = graft.ops.Dv.read(spark, tbl, "id", broadcastMaxBytes = 0L)
    assert(!planOf(big).contains("BroadcastHashJoin"),
      s"gated read still broadcasts:\n${planOf(big)}")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    assert(snap(big) == snap(small) && !snap(big).contains(3L) &&
      snap(big).size == 37)
  }

  test("purge trigger wired to stats: needsPurge flips at the ratio " +
      "and clears after the fold") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dv4")
    val tbl = root.resolve("t").toString
    (1 to 100).map(i => (i.toLong, (i - 1) / 25 + 1, i * 1.0))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    assert(!graft.ops.Dv.needsPurge(spark, tbl, "id"), "no DV yet")
    graft.ops.Dv.delete(spark, tbl, Seq(3L, 4L).toDF("id"), "id")
    assert(!graft.ops.Dv.needsPurge(spark, tbl, "id", maxRatio = 0.05),
      "2% tombstones under a 5% trigger")
    graft.ops.Dv.delete(spark, tbl,
      (5L to 10L).toDF("id"), "id")
    assert(graft.ops.Dv.needsPurge(spark, tbl, "id", maxRatio = 0.05),
      "8% tombstones over a 5% trigger")
    val touched = graft.ops.Dv.purge(spark, tbl, "id", "part")
    assert(touched == Seq(1))
    assert(!graft.ops.Dv.needsPurge(spark, tbl, "id", maxRatio = 0.05))
    assert(spark.read.parquet(tbl).count() == 92L)
  }

  test("DV writers serialize on _dv.lock: a delete racing a purge " +
      "waits, its tombstone is never lost; a stale lock fails loudly") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = Files.createTempDirectory("graft-dv-lock")
    val tbl = root.resolve("t").toString
    (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1, i * 1.0))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    // hold the lock, simulating a purge mid-flight between its key read
    // and its _dv wipe — the exact window where an unserialized delete
    // would land a tombstone only to have it wiped unfolded
    val lock = Paths.get(s"$tbl/_dv.lock")
    Files.write(lock, Array.emptyByteArray)
    val del = Future {
      graft.ops.Dv.delete(spark, tbl, Seq(7L).toDF("id"), "id")
    }
    Thread.sleep(300)
    assert(!del.isCompleted, "delete must block while the lock is held")
    assert(!Files.exists(Paths.get(s"$tbl/_dv")),
      "tombstone landed under a held lock")
    Files.delete(lock)
    Await.result(del, 60.seconds)
    // the tombstone survived the race window: MoR hides id 7, purge
    // folds it for real
    assert(graft.ops.Dv.read(spark, tbl, "id")
      .filter(col("id") === 7L).count() == 0L)
    graft.ops.Dv.purge(spark, tbl, "id", "part")
    assert(spark.read.parquet(tbl).count() == 39L &&
      !Files.exists(lock), "lock leaked after purge")
    // a lock abandoned by a crashed writer fails loudly, not silently
    Files.write(lock, Array.emptyByteArray)
    val e = intercept[IllegalStateException] {
      // private timeout isn't reachable; exercise via a short-lived
      // reflection-free path: delete with the default would stall 60 s,
      // so call through the public surface on a copy with the lock held
      // and a tiny deadline via the package-private helper
      graft.ops.Dv.deleteWithTimeout(spark, tbl, Seq(8L).toDF("id"),
        "id", timeoutMs = 300L)
    }
    assert(e.getMessage.contains("held or stale"))
    Files.delete(lock)
  }
}
