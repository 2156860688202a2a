package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for multi-
  * dimensional data skipping.
  *
  * Why this matters at 100 TB: a table sorted on ONE column skips
  * files/row-groups only for predicates on that column; a 2-D box query
  * (time × account, partkey × suppkey, lat × lon) over a single-column
  * layout still touches almost every file for the second dimension.
  * Interleaving the key bits (the Morton curve) makes every contiguous
  * z-range a bounded box in BOTH dimensions, so per-file min/max stats —
  * the skipping unit of every table format, and of parquet row-group
  * pruning inside Spark's scan — stay tight on both columns at once.
  * LayoutSpec measures it: the same box query prunes several times more
  * files under the z layout than under the linear one.
  *
  * The z-value itself is pure integer bit arithmetic (the classic
  * spread-bits ladder), identical in Spark and DuckDB — so the
  * clustering KEY is oracle-checkable (q100) even though file layout is
  * an engine-side property.
  */
object Layout {

  /** Mask ladder of the 16→32-bit bit-spread. */
  private val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L,
    1 -> 0x55555555L)

  /** Low 16 bits of `c` spread to even bit positions of a 32-bit word:
    * bit i moves to bit 2i. Shift-or-mask ladder, exact in long
    * arithmetic in any engine.
    */
  def spread16(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** 32-bit Morton z-value of the low 16 bits of (a, b): a's bits on
    * even positions, b's on odd.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** SQL (DuckDB) mirror of [[spread16]] as an expression string over
    * `x` (must already be a BIGINT in [0, 65535]).
    */
  def spread16Sql(x: String): String =
    SpreadSteps.foldLeft(x) { case (e, (s, m)) =>
      s"((($e) | (($e) << $s)) & $m)"
    }

  /** k-column Morton z-value (round 14 — production OPTIMIZE ZORDER
    * takes k columns, not 2): bit i of column j lands at position
    * i·k + j, interleaving all k ladders. Built as a flat OR of
    * single-bit shift terms — exact long arithmetic, identical in any
    * engine (the 2-column [[zValue]] is the k = 2 special case bit for
    * bit), codegen-friendly (one deterministic expression tree, no
    * UDF). `bits` per column defaults to 16; k·bits ≤ 63 keeps the key
    * in a signed BIGINT.
    */
  def zValueK(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, "interleave needs at least 2 columns")
    require(cols.size * bits <= 63, s"${cols.size} cols x $bits bits " +
      "overflows a signed 64-bit key")
    val k = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      val x = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * k + j): Column
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** SQL (DuckDB) mirror of [[zValueK]] over expressions already BIGINT
    * in [0, 2^bits).
    */
  def zValueKSql(exprs: Seq[String], bits: Int = 16): String = {
    val k = exprs.size
    exprs.zipWithIndex.flatMap { case (e, j) =>
      (0 until bits).map(i => s"(((($e) >> $i) & 1) << ${i * k + j})")
    }.mkString("(", " | ", ")")
  }

  /** Write `df` z-clustered on (a, b): range-partition by z-value (a
    * distributed sort — each task owns one contiguous z-range, i.e. one
    * bounded 2-D box) and emit one file per range. `nFiles` sizes the
    * skipping granularity: at production scale pick rows/file ≈ the
    * row-group budget (e.g. 128 MB), here it is explicit for the spec.
    */
  def zOrderWrite(df: DataFrame, a: String, b: String, path: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(a), col(b)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of (a, b) — exactly the stats a table format
    * stores for file skipping. One distributed pass over the written
    * files keyed by `input_file_name`.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
      a: String, b: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"),
        count(lit(1)).as("rows"))

  /** How many files a 2-D box predicate must touch under the stats
    * table returned by [[fileStats]] — the skipping metric LayoutSpec
    * compares across layouts.
    */
  def filesTouched(stats: DataFrame, aLo: Long, aHi: Long, bLo: Long,
      bHi: Long): Long =
    stats.filter(col("max_a") >= aLo && col("min_a") <= aHi &&
      col("max_b") >= bLo && col("min_b") <= bHi).count()

  /** LOGICAL model of the file layout, deterministic end-to-end so the
    * z-vs-linear skipping comparison sits under the oracle hash gate
    * (q112) and not only in LayoutSpec's physical measurement: rows
    * sorted by `order` (a TOTAL order — callers append unique tiebreak
    * columns) are cut into `nFiles` equal runs, bucket = ⌊rank·nFiles/n⌋
    * — exactly the equal-rows split [[zOrderWrite]]'s range partition
    * targets — and each run reports the (min, max) of both predicate
    * columns, i.e. the per-file stats a table format stores.
    *
    * Scale shape: the rank is the distributed two-pass zipWithIndex
    * idiom ([[GraphOps.withPosition]] — range-partitioned sort, never a
    * single-task window), the row count broadcasts as one row, and the
    * stats table is `nFiles` rows.
    */
  def bucketStats(df: DataFrame, a: String, b: String, nFiles: Int,
      order: Column*): DataFrame = {
    // withPosition materializes its sorted table internally (its count
    // pass and this consumer share one localCheckpoint), so no pin here;
    // n is the rank's own offsets total — the first draft re-scanned
    // `df` with a separate count aggregate, and the second re-aggregated
    // max(__pos)+1 over the ranked table plus a broadcast cross join of
    // the count row: one extra job per layout, for a number the offsets
    // pass had already computed
    val (ranked, n) = GraphOps.withPositionCounted(df, "__pos", order: _*)
    ranked
      .withColumn("bucket",
        expr(s"CAST((__pos * $nFiles) div ${math.max(n, 1L)} AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"),
        count(lit(1)).as("rows"))
  }

  /** One comparison row per layout: how many of the `nFiles` stat
    * buckets a 2-D box predicate touches under [[bucketStats]] of the
    * given `order`. The q112 face unions the z-order and linear rows.
    */
  def bucketsTouched(df: DataFrame, layout: String, a: String, b: String,
      nFiles: Int, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      order: Column*): DataFrame =
    bucketStats(df, a, b, nFiles, order: _*)
      .agg(count(lit(1)).as("buckets_total"),
        sum(when(col("max_a") >= aLo && col("min_a") <= aHi &&
          col("max_b") >= bLo && col("min_b") <= bHi, 1L)
          .otherwise(0L)).as("buckets_touched"))
      .select(lit(layout).as("layout"), col("buckets_total"),
        col("buckets_touched"))

  /** k-column [[bucketStats]]: per-bucket (min, max) of EVERY clustering
    * column, named `min_<c>`/`max_<c>`. Same distributed-rank shape.
    */
  def bucketStatsK(df: DataFrame, cols: Seq[String], nFiles: Int,
      order: Column*): DataFrame = {
    // no pin: see bucketStats — withPosition materializes internally,
    // and n is the rank's own offsets total (no re-aggregation)
    val (ranked, n) = GraphOps.withPositionCounted(df, "__pos", order: _*)
    ranked
      .withColumn("bucket",
        expr(s"CAST((__pos * $nFiles) div ${math.max(n, 1L)} AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
  }

  /** k-column [[bucketsTouched]]: the k-D box predicate is
    * `bounds(c) = (lo, hi)` per clustering column.
    */
  def bucketsTouchedK(df: DataFrame, layout: String,
      bounds: Seq[(String, (Long, Long))], nFiles: Int,
      order: Column*): DataFrame = {
    val hit = bounds.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    bucketStatsK(df, bounds.map(_._1), nFiles, order: _*)
      .agg(count(lit(1)).as("buckets_total"),
        sum(when(hit, 1L).otherwise(0L)).as("buckets_touched"))
      .select(lit(layout).as("layout"), col("buckets_total"),
        col("buckets_touched"))
  }

  /** k-column [[fileStats]]: per-file min/max of every clustering
    * column from the PHYSICAL files, named like [[bucketStatsK]].
    */
  def fileStatsK(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** Files a k-D box predicate must touch under [[fileStatsK]]. */
  def filesTouchedK(stats: DataFrame,
      bounds: Seq[(String, (Long, Long))]): Long =
    stats.filter(bounds.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)).count()
}
