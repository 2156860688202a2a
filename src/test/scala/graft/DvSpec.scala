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
}
