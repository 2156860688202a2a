package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Small-file compaction (ops/Compact.scala): the layout guarantee the
  * q127 hash gate cannot see — over-fragmented partitions end up with at
  * most their planned file count (and strictly fewer files than before),
  * already-compact partitions' files come through byte-identical, and no
  * row is ever changed.
  */
class CompactSpec extends SparkSpec {

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

  test("compactPartitions shrinks fragmented partitions, leaves compact " +
      "ones byte-identical, and changes no row") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact")
    val tbl = root.resolve("t").toString
    val rows = (1 to 3000).map(i => (i.toLong, i % 3 + 1, i * 1.0))
      .toDF("id", "part", "v")
    // parts 1 and 2 fragmented to ~8 files each; part 3 written compact
    rows.filter(col("part") =!= 3)
      .repartition(8, col("id"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    rows.filter(col("part") === 3).coalesce(1)
      .write.mode("append").partitionBy("part").parquet(tbl)
    val before = md5OfFiles(Paths.get(tbl))
    def nFiles(m: Map[String, String], p: Int): Int =
      m.keySet.count(_.startsWith(s"part=$p"))
    assert(nFiles(before, 1) >= 4 && nFiles(before, 2) >= 4)
    assert(nFiles(before, 3) == 1)

    // huge target ⇒ plan is 1 file per partition
    val plans = graft.ops.Compact.compactPartitions(spark, tbl, "part",
      "id", 1L << 30)
    assert(plans.map(_.value).toSet == Set("1", "2", "3"))
    assert(plans.filter(_.touched).map(_.value).toSet == Set("1", "2"))
    plans.foreach(p => assert(p.plannedOut == 1))

    val after = md5OfFiles(Paths.get(tbl))
    // touched partitions: at most the planned count, strictly fewer
    Seq(1, 2).foreach { p =>
      assert(nFiles(after, p) == 1,
        s"part=$p has ${nFiles(after, p)} files after compaction")
      assert(nFiles(after, p) < nFiles(before, p))
    }
    // the already-compact partition was never rewritten
    val b3 = before.filter(_._1.startsWith("part=3"))
    val a3 = after.filter(_._1.startsWith("part=3"))
    assert(b3 == a3, "compact partition's files changed (paths or bytes)")

    // row fidelity: compaction must never change a row
    val got = spark.read.parquet(tbl)
      .select(col("id"), col("part").cast("int").as("part"), col("v"))
      .as[(Long, Int, Double)].collect().toSet
    val want = (1 to 3000).map(i => (i.toLong, i % 3 + 1, i * 1.0)).toSet
    assert(got == want)
  }

  test("compactPartitions respects a byte target with multiple bins") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact2")
    val tbl = root.resolve("t").toString
    // one partition, 32 tiny files, ~padded payload so bytes are nontrivial
    val rows = (1 to 20000)
      .map(i => (i.toLong, 1, "x" * 64 + i.toString))
      .toDF("id", "part", "payload")
    rows.repartition(32, col("id"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val parts = graft.ops.Compact.listPartitions(spark, tbl, "part")
    assert(parts.size == 1)
    val (_, n0, bytes) = parts.head
    assert(n0 == 32)
    // target a quarter of the partition ⇒ plan 4-ish bins, never more
    // files than planned, never fewer than 1
    val target = math.max(1L, bytes / 4)
    val plans = graft.ops.Compact.compactPartitions(spark, tbl, "part",
      "id", target)
    val plan = plans.head
    assert(plan.touched && plan.plannedOut >= 2)
    val nAfter = graft.ops.Compact.listPartitions(spark, tbl, "part")
      .head._2
    assert(nAfter <= plan.plannedOut, s"$nAfter > planned ${plan.plannedOut}")
    assert(nAfter >= 1 && nAfter < n0)
    // fidelity
    assert(spark.read.parquet(tbl).count() == 20000L)
  }

  test("compactPartitions handles escaped and null partition values") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact3")
    val tbl = root.resolve("t").toString
    // 'a b' is stored as the ESCAPED directory part=a%20b; a null value
    // lands under the __HIVE_DEFAULT_PARTITION__ sentinel directory —
    // both must still be pruned, binned, and rewritten correctly
    val data = (1 to 600).map { i =>
      val p: String = (i % 3) match {
        case 0 => "a b"
        case 1 => null
        case _ => "plain"
      }
      (i.toLong, p, i * 1.0)
    }
    val rows = data.toDF("id", "part", "v")
    rows.repartition(8, col("id"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val before = graft.ops.Compact.listPartitions(spark, tbl, "part")
    assert(before.map(_._1).toSet ==
      Set("a b", "__HIVE_DEFAULT_PARTITION__", "plain"),
      s"listPartitions must return UNESCAPED values: $before")
    assert(before.forall(_._2 >= 4))
    val plans = graft.ops.Compact.compactPartitions(spark, tbl, "part",
      "id", 1L << 30)
    assert(plans.forall(p => p.touched && p.plannedOut == 1))
    val after = graft.ops.Compact.listPartitions(spark, tbl, "part")
    after.foreach { case (v, n, _) =>
      assert(n == 1, s"partition '$v' has $n files after compaction")
    }
    // row fidelity, null partition included
    val got = spark.read.parquet(tbl)
      .select(col("id"), col("part"), col("v"))
      .as[(Long, Option[String], Double)].collect().toSet
    assert(got == data.map { case (i, p, v) => (i, Option(p), v) }.toSet)
  }

  test("a table already carrying a reserved temp column fails fast") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact4")
    val tbl = root.resolve("t").toString
    (1 to 100).map(i => (i.toLong, 1, i.toLong)).toDF("id", "part", "__bin")
      .repartition(8, col("id"))
      .write.mode("overwrite").partitionBy("part").parquet(tbl)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Compact.compactPartitions(spark, tbl, "part", "id",
        1L << 30)
    }
    assert(e.getMessage.contains("__bin"))
  }
}
