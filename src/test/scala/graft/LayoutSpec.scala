package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (by-hand Morton replay)") {
    def morton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (12345L, 54321L), (40000L, 7L))
    val rows = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"))
        .as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(rows((a, b)) === morton(a & 0xFFFF, b & 0xFFFF),
        s"zValue($a, $b)")
    }
  }

  test("z-order preserves locality: z-range ⊆ bounded 2-D box") {
    // every aligned z-interval of length 4^k is EXACTLY a 2^k × 2^k
    // box — the property file skipping relies on. Check k = 4 (256-z
    // blocks are 16×16 boxes) over a deterministic sample.
    val df = (0L until 4096L)
      .map(i => (i * 2654435761L % 65536, i * 40503L % 65536))
      .toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b")).as("z")).collect()
    rows.groupBy(r => r.getAs[Long]("z") >> 8).foreach { case (_, rs) =>
      val as = rs.map(_.getAs[Long]("a"))
      val bs = rs.map(_.getAs[Long]("b"))
      assert(as.max - as.min < 16, "z-block wider than its box in a")
      assert(bs.max - bs.min < 16, "z-block wider than its box in b")
    }
  }

  test("z-clustered files skip a 2-D box query several times better " +
      "than a linear sort") {
    // 100k rows uniform over 256×256; 64 files either way. A 16×16 box
    // holds ~0.4 % of the data: the a-sorted layout bounds only a (every
    // file spans all of b — the box's a-range hits ~1/16 of files), the
    // z layout bounds BOTH (files are contiguous z-ranges = bounded
    // boxes). Deterministic multiplicative-hash coordinates.
    // NOT two multiplicative hashes of the same id — those make b a
    // function of a (a 1-D lattice) and boxes go empty; the div/mod
    // grid covers the full 256×256 square
    val n = 100000L
    val df = spark.range(n).select(
      (col("id") % 256).as("a"),
      ((col("id") / lit(256)).cast("long") * 131L % 256).as("b"))
    val base = java.nio.file.Files.createTempDirectory("layoutspec")
      .toString
    val linear = s"$base/linear"
    val zpath = s"$base/zorder"
    df.repartitionByRange(64, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite").parquet(linear)
    Layout.zOrderWrite(df, "a", "b", zpath, 64)
    val boxes = Seq((16L, 31L, 192L, 207L), (128L, 143L, 0L, 15L),
      (240L, 255L, 240L, 255L))
    val (linTouched, zTouched) = (
      boxes.map(bx => Layout.filesTouched(
        Layout.fileStats(spark, linear, "a", "b"),
        bx._1, bx._2, bx._3, bx._4)).sum,
      boxes.map(bx => Layout.filesTouched(
        Layout.fileStats(spark, zpath, "a", "b"),
        bx._1, bx._2, bx._3, bx._4)).sum)
    // correctness first: the layouts hold identical data
    val lCount = spark.read.parquet(linear)
      .filter(col("a").between(16, 31) && col("b").between(192, 207))
      .count()
    val zCount = spark.read.parquet(zpath)
      .filter(col("a").between(16, 31) && col("b").between(192, 207))
      .count()
    assert(lCount === zCount && zCount > 0)
    // the skipping win: z touches at least 2× fewer files on box
    // queries (typically ~4-8× at this granularity)
    assert(zTouched * 2 <= linTouched,
      s"z layout touched $zTouched files vs linear $linTouched")
  }

  test("zValueK interleaves k=3 exactly (by-hand replay) and matches " +
      "zValue at k=2") {
    def morton3(a: Long, b: Long, c: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (3 * i)
        z |= ((b >> i) & 1L) << (3 * i + 1)
        z |= ((c >> i) & 1L) << (3 * i + 2)
      }
      z
    }
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L),
      (0L, 0L, 1L), (65535L, 65535L, 65535L), (12345L, 54321L, 999L))
    val got = cases.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zValueK(Seq(col("a"), col("b"), col("c"))).as("z3"),
        Layout.zValueK(Seq(col("a"), col("b"))).as("zk2"),
        Layout.zValue(col("a"), col("b")).as("z2"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z3") ===
        morton3(r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(r.getAs[Long]("zk2") === r.getAs[Long]("z2"),
        "k=2 zValueK diverges from the ladder zValue")
    }
  }

  test("compactPartitionsZ merges fragments AND co-clusters: a 3-D box " +
      "query touches ≥2× fewer files than md5-binned compaction") {
    // two day-partitions, 16 fragment files each, rows uniform over a
    // 64x64x64 (a, b, c) grid
    val n = 200000L
    def mk(tag: String): String = {
      val df = spark.range(n).select(
        col("id"),
        (col("id") % 2).cast("int").as("day"),
        (col("id") % 64).as("a"),
        ((col("id") / 64).cast("long") * 131L % 64).as("b"),
        ((col("id") / 4096).cast("long") * 37L % 64).as("c"))
      val path = java.nio.file.Files
        .createTempDirectory(s"layoutz-$tag").toString + "/t"
      df.repartition(64, col("id"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      path
    }
    val (zTbl, mTbl) = (mk("z"), mk("m"))
    val before = spark.read.parquet(zTbl).count()
    // byte target sized to plan ~16 output files per partition — enough
    // z-granularity that a 1/64-volume box is a small z-range
    val bytes = graft.ops.Compact
      .listPartitions(spark, zTbl, "day").map(_._3).sum
    val target = bytes / 32
    val planZ = graft.ops.Compact.compactPartitionsZ(spark, zTbl, "day",
      "id", target, Seq("a", "b", "c"))
    val planM = graft.ops.Compact.compactPartitions(spark, mTbl, "day",
      "id", target)
    assert(planZ.forall(_.touched) && planM.forall(_.touched))
    // rows preserved exactly
    assert(spark.read.parquet(zTbl).count() === before)
    assert(spark.read.parquet(zTbl).agg(sum(col("id"))).head.getLong(0)
      === spark.read.parquet(mTbl).agg(sum(col("id"))).head.getLong(0))
    // fragments merged on both paths
    def nFiles(p: String) = graft.ops.Compact
      .listPartitions(spark, p, "day").map(_._2).sum
    assert(nFiles(zTbl) < 128 && nFiles(mTbl) < 128)
    // the co-clustering win: 16x16x16 boxes
    val boxes = Seq(
      Seq("a" -> ((0L, 15L)), "b" -> ((16L, 31L)), "c" -> ((32L, 47L))),
      Seq("a" -> ((48L, 63L)), "b" -> ((0L, 15L)), "c" -> ((0L, 15L))))
    def touched(p: String) = boxes.map(bx => graft.ops.Layout
      .filesTouchedK(graft.ops.Layout.fileStatsK(spark, p,
        Seq("a", "b", "c")), bx)).sum
    val (tz, tm) = (touched(zTbl), touched(mTbl))
    // compare the touched FRACTION (bytes-read share): the md5 path's
    // file count is additionally bounded by shuffle parallelism, so
    // absolute counts aren't comparable across layouts
    val (nz, nm) = (nFiles(zTbl) * boxes.size, nFiles(mTbl) * boxes.size)
    assert(tz * 2 * nm <= tm * nz,
      s"z-compacted layout touched $tz/$nz files vs md5 $tm/$nm")
    assert(tm.toDouble / nm > 0.9,
      "md5 baseline should touch ~every file on a box query")
  }
}
