package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction (the OPTIMIZE job every partitioned lakehouse
  * table needs periodically): rewrite each over-fragmented partition into
  * ~⌈bytes/target⌉ files, leave already-compact partitions' files
  * byte-identical, never change a row.
  *
  * Scale shape — ONE distributed job, no per-partition driver loop:
  *  - the plan (partition → current files/bytes → target file count) is
  *    a single filesystem listing, bounded by the PARTITION count, not
  *    the row count;
  *  - only partitions with more files than their target are read back
  *    (static IN-list partition pruning — an already-compact partition's
  *    files are never opened);
  *  - each row gets a deterministic bin `pmod(md5-28bit(key), nOut)` from
  *    the broadcast plan, and `repartition(partCol, bin)` lands every
  *    (partition, bin) in one shuffle task → that task writes one file
  *    per partition directory it holds. Hash collisions between bins can
  *    only MERGE bins (fewer, larger files — still compaction), never
  *    split them, so filesAfter ≤ min(filesBefore, plannedOut) per
  *    touched partition;
  *  - the write is dynamic partition overwrite: touched directories are
  *    staged and swapped, untouched directories never listed.
  *
  * The merged frame is localCheckpoint-ed before the write because the
  * output path is also the pruned input path (same contract as
  * [[Cow.mergeCow]]); its size is bounded by the touched partitions.
  *
  * Reference context: the reference (563-line pandas pipelines) has no
  * storage layer; this belongs to the warehouse extension surface
  * (SURVEY §2.12), the maintenance sibling of q111's CoW merge.
  */
object Compact {

  /** One partition's audit row: value as it appears in the directory
    * name, files and bytes before, planned output file count (0 target
    * means "not touched").
    */
  final case class PartPlan(value: String, filesBefore: Int,
      bytes: Long, plannedOut: Int, touched: Boolean)

  /** List `basePath`'s `partCol=v` leaf directories with their data-file
    * counts and byte totals (committed files only — `_SUCCESS`, hidden
    * and staging entries excluded). Values are returned UNESCAPED (the
    * directory name carries Spark's partition-path escaping: 'a:b' is
    * stored as 'a%3Ab' — spaces pass through, special chars do not); a
    * null partition appears as the literal
    * `__HIVE_DEFAULT_PARTITION__` sentinel.
    */
  def listPartitions(spark: SparkSession, basePath: String,
      partCol: String): Seq[(String, Int, Long)] = {
    val root = new org.apache.hadoop.fs.Path(basePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partCol="))
      .map { d =>
        val files = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(d.getPath.getName.stripPrefix(s"$partCol=")),
          files.size, files.map(_.getLen).sum)
      }
      .sortBy(_._1)
  }

  /** Compact the partitioned parquet table at `basePath` toward
    * `targetBytes` per file. `keyCol` drives the deterministic bin
    * assignment (any stable, well-spread column — the table's id).
    * Returns the per-partition plan (the compaction audit trail).
    */
  def compactPartitions(spark: SparkSession, basePath: String,
      partCol: String, keyCol: String, targetBytes: Long): Seq[PartPlan] = {
    val NullPart = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    withPrunedTouched(spark, basePath, partCol, targetBytes) {
      (pruned, touched) =>
        val planDf = broadcast(spark.createDataFrame(
          touched.map(p => (p.value, p.plannedOut)))
          .toDF("__pv", "__n_out"))
        val bin: Column = pmod(
          conv(substring(md5(col(keyCol).cast("string")), 1, 7), 16, 10)
            .cast("long"),
          col("__n_out").cast("long"))
        pruned
          .join(planDf,
            coalesce(col(partCol).cast("string"), lit(NullPart))
              === col("__pv"))
          .withColumn("__bin", bin)
          .repartition(col(partCol), col("__bin"))
          .drop("__pv", "__n_out", "__bin")
    }
  }

  /** [[compactPartitions]] composed with OPTIMIZE ZORDER (round 14 —
    * production compaction re-CLUSTERS while it merges): touched
    * partitions are rewritten with rows co-clustered on `zCols`' Morton
    * key ([[Layout.zValueK]]) instead of md5-binned, so the one rewrite
    * pays for both the small-file merge and k-dimensional data skipping
    * (LayoutSpec measures the files-touched win on a 3-column box
    * query; md5-binned compaction merges fragments but prunes nothing).
    *
    * Binning is a range partition over (partition, z) sized to the
    * plan's total output files: each task owns a contiguous z-range
    * inside one partition (straddling a directory boundary at worst
    * once), so every output file is a bounded k-D box and its min/max
    * stats stay tight on ALL k columns. No per-partition window — a
    * huge partition spreads across many range tasks, the same
    * distributed-sort shape as [[Layout.zOrderWrite]].
    */
  def compactPartitionsZ(spark: SparkSession, basePath: String,
      partCol: String, keyCol: String, targetBytes: Long,
      zCols: Seq[String]): Seq[PartPlan] =
    withPrunedTouched(spark, basePath, partCol, targetBytes) {
      (pruned, touched) =>
        val totalOut = touched.map(_.plannedOut.toLong).sum
          .min(Int.MaxValue.toLong).toInt
        pruned
          .withColumn("__z", Layout.zValueK(zCols.map(col)))
          .repartitionByRange(totalOut, col(partCol), col("__z"),
            col(keyCol))
          .sortWithinPartitions(col(partCol), col("__z"), col(keyCol))
          .drop("__z")
    }

  /** Shared compaction skeleton: list → plan → prune to touched
    * partitions → caller-provided re-binning → dynamic-overwrite land.
    * Returns the full plan; a no-touch table returns without reading a
    * single data file.
    */
  private def withPrunedTouched(spark: SparkSession, basePath: String,
      partCol: String, targetBytes: Long)(
      rebin: (DataFrame, Seq[PartPlan]) => DataFrame): Seq[PartPlan] = {
    val NullPart = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    val parts = listPartitions(spark, basePath, partCol)
    val plans = parts.map { case (v, n, bytes) =>
      val out = math.max(1L,
        (bytes + targetBytes - 1L) / targetBytes).toInt
      PartPlan(v, n, bytes, out, n > out)
    }
    val touched = plans.filter(_.touched)
    if (touched.isEmpty) return plans
    val base = spark.read.parquet(basePath)
    val clash = base.columns.filter(Set("__pv", "__n_out", "__bin", "__z"))
    require(clash.isEmpty,
      s"table carries reserved temp columns: ${clash.mkString(",")}")
    // the null-partition directory (__HIVE_DEFAULT_PARTITION__) can't go
    // through the typed IN-list — prune it with isNull and join the plan
    // row via the same sentinel
    val (nullTouched, valTouched) = touched.partition(_.value == NullPart)
    // partition-directory values are strings; type the IN-list literals
    // to the inferred partition-column type so pruning stays static
    val typedVal: String => Any = base.schema(partCol).dataType match {
      case org.apache.spark.sql.types.IntegerType => _.toInt
      case org.apache.spark.sql.types.LongType    => _.toLong
      case _                                      => identity[String]
    }
    val valueMatch =
      if (valTouched.isEmpty) lit(false)
      else col(partCol).isin(valTouched.map(p => typedVal(p.value)): _*)
    val pruned = base.filter(
      if (nullTouched.isEmpty) valueMatch
      else valueMatch || col(partCol).isNull)
    val binned = rebin(pruned, touched).localCheckpoint()
    binned.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(basePath)
    plans
  }
}
