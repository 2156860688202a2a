package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated transaction log with time travel — the manifest
  * layer q111's in-place CoW merge lacks: every commit writes NEW data
  * files and a versioned manifest listing exactly the files that make up
  * that snapshot, so EVERY past version stays readable forever (until a
  * retention vacuum) and concurrent readers of v(n) are never disturbed
  * by the writer of v(n+1). This is the Iceberg/Delta snapshot contract
  * re-expressed minimally: the table IS its newest manifest; data files
  * are immutable once written.
  *
  * Scale shape:
  *  - a manifest is one small text file of relative file paths — O(file
  *    count), read once on the driver like any table metadata;
  *  - an upsert commit rewrites ONLY the partitions the batch touches
  *    (same pruned-read + anti-join shape as [[Cow.mergeCow]]), landing
  *    them as fresh files under `v{n}/` — untouched partitions' files
  *    are REFERENCED by the new manifest, not copied, so commit cost is
  *    bounded by the touched partitions, never the table;
  *  - reading any version is `spark.read.parquet(files: _*)` — an
  *    ordinary multi-file scan, partition-parallel, no driver work
  *    beyond the manifest. The partition column travels INSIDE the data
  *    files (written via a duplicated `__part` directory column), so an
  *    explicit-file-list read needs no basePath partition inference
  *    across versions.
  *
  * Reference context: the reference has no storage layer; this belongs
  * to the warehouse extension surface (SURVEY §2.12) — the
  * version-isolation sibling of q111 (CoW) and q116 (snapshot diff).
  *
  * Multi-writer safety (round 14): commits are OPTIMISTIC — prepare
  * against a snapshot, conflict-check against every commit that landed
  * since, atomically claim the next version number, land. Disjoint
  * writers race safely; overlapping writers lose exactly one commit to
  * a loud retryable [[TxLog.CommitConflictException]], never silently
  * (see [[TxLog.commitUpsertFrom]]).
  */
object TxLog {

  /** A concurrent commit touched an overlapping partition set — the
    * Delta/Iceberg conflict contract: the snapshot this commit merged
    * against is no longer the truth for its partitions, so the commit
    * ABORTS rather than losing the other writer's update. Retryable:
    * the caller re-runs the whole commit against the new snapshot.
    */
  final class CommitConflictException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  private val PartDir = "__part"

  private def manifestPath(table: String, version: Int) =
    Paths.get(s"$table/_vlog/v$version.json")

  private def claimPath(table: String, version: Int) =
    Paths.get(s"$table/_vlog/v$version.claim")

  /** Atomically reserve version number `v` (CREATE_NEW is the atomic
    * test-and-set on a POSIX filesystem; object stores substitute a
    * conditional PUT). Claims are transient — released after the
    * manifest lands (or on failure).
    */
  private def tryClaim(table: String, v: Int): Boolean =
    try {
      Files.createDirectories(Paths.get(s"$table/_vlog"))
      Files.write(claimPath(table, v), Array.emptyByteArray,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  private def releaseClaim(table: String, v: Int): Unit = {
    Files.deleteIfExists(claimPath(table, v)); ()
  }

  /** Partitions whose file set changed between v−1 and v — commit v's
    * touched set, recovered from the manifests alone (kept files carry
    * over BY REFERENCE, so any pathname entering or leaving the
    * manifest is a rewrite or addition in its partition).
    */
  private def touchedPartitionsOf(table: String, v: Int): Set[String] = {
    val prev = filesOf(table, v - 1).toSet
    val cur = filesOf(table, v).toSet
    ((prev diff cur) ++ (cur diff prev)).flatMap(partOf)
  }

  private def manifestVersions(table: String): Seq[Int] = {
    val dir = Paths.get(s"$table/_vlog")
    if (!Files.isDirectory(dir)) return Nil
    val stream = Files.list(dir) // close it — each call leaks an fd otherwise
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq
    finally stream.close()
  }

  /** Newest committed version, or -1 for an empty log. */
  def currentVersion(table: String): Int =
    manifestVersions(table).foldLeft(-1)(math.max)

  /** Files (relative to `table`) making up `version`'s snapshot. */
  def filesOf(table: String, version: Int): Seq[String] = {
    val p = manifestPath(table, version)
    require(Files.isRegularFile(p), s"no manifest for v$version")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** The `partCol=value` a relative data-file path belongs to. */
  private def partOf(f: String): Option[String] =
    f.split('/').find(_.startsWith(s"$PartDir="))
      .map(_.stripPrefix(s"$PartDir="))

  private def listDataFiles(spark: SparkSession, dir: String,
      table: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // qualify so both sides carry the same scheme — an unqualified base
    // URI refuses to relativize a `file:`-schemed listing
    val base = fs.makeQualified(
      new org.apache.hadoop.fs.Path(table)).toUri
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += base.relativize(f.getPath.toUri).getPath
    }
    out.result().sorted
  }

  private def writeVersionFiles(spark: SparkSession, table: String,
      version: Int, df: DataFrame, partCol: String): Seq[String] = {
    df.withColumn(PartDir, col(partCol).cast("string"))
      .repartition(col(PartDir))
      .write.mode("overwrite").partitionBy(PartDir)
      .parquet(s"$table/v$version")
    listDataFiles(spark, s"$table/v$version", table)
  }

  private def writeManifest(table: String, version: Int,
      files: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(s"$table/_vlog"))
    Files.write(manifestPath(table, version),
      files.sorted.mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Commit `df` as version 0 (the initial snapshot). */
  def commitInitial(spark: SparkSession, table: String, df: DataFrame,
      partCol: String): Int = {
    writeManifest(table, 0,
      writeVersionFiles(spark, table, 0, df, partCol))
    0
  }

  /** Commit an upsert of `batch` (REPLACE matching `keyCol` rows within
    * the touched partitions, append new ones) as the next version.
    * Untouched partitions' files carry over into the new manifest BY
    * REFERENCE; only the touched partitions are read back, merged, and
    * rewritten as fresh `v{n}/` files. Prior versions' data files are
    * never modified or deleted — `readVersion(cur)` keeps returning the
    * exact old snapshot after this commit (TxLogSpec pins it).
    */
  def commitUpsert(spark: SparkSession, table: String, batch: DataFrame,
      keyCol: String, partCol: String): Int =
    commitUpsertFrom(spark, table, batch, keyCol, partCol,
      currentVersion(table))

  /** [[commitUpsert]] with an explicit snapshot version the merge was
    * computed against — the OPTIMISTIC-concurrency core (round 14;
    * VERDICT r13 #2). Protocol, the minimal Delta/Iceberg commit:
    *
    *  1. merge is prepared against v(start)'s snapshot (pruned read +
    *     anti join, lazy);
    *  2. re-read the log head; every commit that landed after `start`
    *     is conflict-checked — its touched partitions (recovered from
    *     the manifest diff) must be DISJOINT from ours, else
    *     [[CommitConflictException]] (retryable — no lost update: the
    *     overlapping writer's rows are not silently resurrected from
    *     our stale snapshot);
    *  3. atomically claim head+1 via CREATE_NEW of a transient
    *     `.claim` file — two racers on the same number serialize here:
    *     the loser waits for the winner's manifest to land, re-checks
    *     conflicts against it, and claims the next number;
    *  4. write data files under the claimed `v{n}/`, then the manifest:
    *     kept files carry over from the head manifest (NOT `start`'s —
    *     a disjoint intervener's files must be referenced).
    *
    * Disjoint racers both land, linearized; overlapping racers — exactly
    * one wins (TxLogSpec pins both). A claim orphaned by a crashed
    * writer stalls peers until `claimTimeoutMs`, then fails loudly
    * (remove the stale `.claim` by hand — the honest minimal answer;
    * production logs lease-expire claims).
    */
  private[graft] def commitUpsertFrom(spark: SparkSession, table: String,
      batch: DataFrame, keyCol: String, partCol: String, start: Int,
      claimTimeoutMs: Long = 60000L): Int = {
    require(start >= 0, "commitInitial first")
    // manifest fragments carry Spark's partition-path ESCAPING
    // ('a b' → 'a%20b') and render a null partition as the
    // __HIVE_DEFAULT_PARTITION__ sentinel; compare against those exact
    // forms, or a special-char (or null) partition would land in
    // keptFiles AND be rewritten — duplicating every upserted row in the
    // new snapshot
    val touched = batch.select(col(partCol).cast("string")).distinct()
      .collect().map { r =>
        val catalog = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils
        if (r.isNullAt(0)) catalog.DEFAULT_PARTITION_NAME
        else catalog.escapePathName(r.getString(0))
      }.toSet
    val touchedFiles = filesOf(table, start)
      .filter(f => partOf(f).exists(touched.contains))
    val dataCols = batch.columns.filterNot(_ == PartDir)
    val merged =
      if (touchedFiles.isEmpty) batch.select(dataCols.map(col): _*)
      else {
        val base = spark.read
          .parquet(touchedFiles.map(f => s"$table/$f"): _*)
          .select(dataCols.map(col): _*)
        batch.select(dataCols.map(col): _*)
          .unionByName(base.join(
            batch.select(col(keyCol)).distinct(), Seq(keyCol),
            "left_anti"))
      }
    occCommit(table, start, touched, claimTimeoutMs) { next =>
      writeVersionFiles(spark, table, next, merged, partCol)
    }
  }

  /** The shared OCC commit core: conflict-check against every commit
    * that landed after `start`, claim head+1 atomically, stage the new
    * data files via `stage(next)`, land the manifest (kept files from
    * the HEAD manifest, minus the touched partitions), release.
    */
  private def occCommit(table: String, start: Int, touched: Set[String],
      claimTimeoutMs: Long)(stage: Int => Seq[String]): Int = {
    val deadline = System.currentTimeMillis() + claimTimeoutMs
    var next = -1
    while (next < 0) {
      val head = currentVersion(table)
      (start + 1) to head foreach { v =>
        val overlap = touchedPartitionsOf(table, v).intersect(touched)
        if (overlap.nonEmpty)
          throw new CommitConflictException(
            s"commit v$v touched partition(s) ${overlap.mkString(",")} " +
              s"concurrently with this commit (snapshot v$start) — " +
              "re-read and retry")
      }
      if (tryClaim(table, head + 1)) {
        // a claim released AFTER its manifest landed but BEFORE we
        // re-read the head can hand us a version that already exists —
        // manifests are only written by claim holders, so existence
        // here is stable: release and re-read
        if (Files.isRegularFile(manifestPath(table, head + 1))) {
          releaseClaim(table, head + 1)
        } else next = head + 1
      } else if (System.currentTimeMillis() > deadline) {
        throw new IllegalStateException(
          s"claim on v${head + 1} of $table not released within " +
            s"$claimTimeoutMs ms — stale claim from a crashed writer?")
      } else Thread.sleep(25)
    }
    try {
      val keptFiles = filesOf(table, next - 1)
        .filterNot(f => partOf(f).exists(touched.contains))
      writeManifest(table, next, keptFiles ++ stage(next))
    } finally releaseClaim(table, next)
    next
  }

  /** Commit a DELETE of `keys` as the next version — the log-backed
    * sibling of [[Cow.deleteCow]], completing the versioned write
    * surface (upsert + delete): key-bearing partitions (discovered by
    * one semi join against the snapshot) rewrite as fresh files
    * WITHOUT the victims, untouched files carry by reference, and
    * every prior version stays readable — a GDPR purge that can still
    * time-travel its own before-state until vacuum. A partition fully
    * emptied by the delete simply has no files in the new manifest (no
    * directory juggling — the manifest IS the table, the
    * [[Cow.deleteCow]] pitfall doesn't exist here). Deleting keys the
    * table doesn't hold commits nothing and returns the current head.
    * Same OCC protocol and conflict contract as [[commitUpsertFrom]].
    */
  def commitDelete(spark: SparkSession, table: String, keys: DataFrame,
      keyCol: String, partCol: String): Int =
    commitDeleteFrom(spark, table, keys, keyCol, partCol,
      currentVersion(table))

  private[graft] def commitDeleteFrom(spark: SparkSession, table: String,
      keys: DataFrame, keyCol: String, partCol: String, start: Int,
      claimTimeoutMs: Long = 60000L): Int = {
    require(start >= 0, "commitInitial first")
    val k = keys.select(col(keyCol)).distinct()
    // data files carry the original partCol (only the duplicated
    // __part copy went to the directory names), so the touched list
    // comes straight off the plainly-read snapshot rows
    val base = spark.read
      .parquet(filesOf(table, start).map(f => s"$table/$f"): _*)
    val catalog = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils
    val touched = base.join(k, Seq(keyCol), "left_semi")
      .select(col(partCol).cast("string")).distinct()
      .collect().map { r =>
        if (r.isNullAt(0)) catalog.DEFAULT_PARTITION_NAME
        else catalog.escapePathName(r.getString(0))
      }.toSet
    if (touched.isEmpty) return currentVersion(table)
    val touchedFiles = filesOf(table, start)
      .filter(f => partOf(f).exists(touched.contains))
    val survivors = spark.read
      .parquet(touchedFiles.map(f => s"$table/$f"): _*)
      .join(k, Seq(keyCol), "left_anti")
    occCommit(table, start, touched, claimTimeoutMs) { next =>
      writeVersionFiles(spark, table, next, survivors, partCol)
    }
  }

  /** Read the table AS OF `version` (time travel). */
  def readVersion(spark: SparkSession, table: String,
      version: Int): DataFrame =
    spark.read
      .parquet(filesOf(table, version).map(f => s"$table/$f"): _*)
      .drop(PartDir)

  /** Retention vacuum: keep the newest `retainVersions` snapshots,
    * delete every older manifest and every data file no kept manifest
    * references. Kept versions remain byte-for-byte readable (shared
    * files are reference-counted by the manifest union, never deleted
    * while referenced — TxLogSpec pins it). Returns
    * (dataFilesDeleted, manifestsDeleted).
    */
  def vacuum(spark: SparkSession, table: String,
      retainVersions: Int = 1): (Int, Int) = {
    require(retainVersions >= 1, "must retain at least the newest version")
    val cur = currentVersion(table)
    require(cur >= 0, "empty log")
    // a version whose manifest an EARLIER vacuum already removed cannot
    // be retained — clamp to what still exists, or growing the retention
    // after a tighter vacuum would crash on the missing manifest
    val existing = manifestVersions(table).toSet
    val keepFrom = math.max(0, cur - retainVersions + 1)
    val referenced = (keepFrom to cur).filter(existing.contains)
      .flatMap(v => filesOf(table, v)).toSet
    val all = (0 to cur)
      .map(v => s"$table/v$v")
      .filter(d => Files.isDirectory(Paths.get(d)))
      .flatMap(d => listDataFiles(spark, d, table))
    val doomed = all.filterNot(referenced.contains)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    doomed.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$table/$f"), false); ()
    }
    val oldManifests = (0 until keepFrom)
      .filter(v => Files.deleteIfExists(manifestPath(table, v)))
    (doomed.size, oldManifests.size)
  }
}
