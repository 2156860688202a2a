package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    them as fresh files — untouched partitions' files are REFERENCED
  *    by the new manifest, not copied, so commit cost is bounded by the
  *    touched partitions, never the table;
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
  *
  * Round 15 hardening + scan planning:
  *  - manifests land via temp-file + ATOMIC_MOVE, so a racing reader
  *    never observes a half-written head manifest (a truncated kept-file
  *    list would silently drop untouched partitions from the next
  *    snapshot);
  *  - data files STAGE to a `stage-<uuid>/` directory BEFORE the version
  *    number is claimed; the claim is then held only across a directory
  *    rename plus one manifest write (milliseconds), not the whole Spark
  *    write — a minutes-long commit no longer starves concurrent
  *    writers into spurious claim timeouts;
  *  - manifest entries optionally carry per-file row counts and
  *    per-column min/max ([[FileEntry]]) — the Iceberg scan-planning
  *    contract: [[readVersionPruned]] skips files whose recorded ranges
  *    cannot satisfy a predicate before the scan is even planned, so a
  *    selective query against a versioned 100 TB table opens a handful
  *    of files instead of all of them. Stats ride the manifest BY
  *    REFERENCE with their files across commits; files without stats
  *    are conservatively always read;
  *  - [[commitAppend]] (blind append, Delta semantics: never conflicts,
  *    linearizes via the claim) and [[commitOptimize]] (data-identical
  *    rewrite — compaction + optional z-clustering — that conflicts
  *    like any rewrite) complete the commit taxonomy.
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

  /** One manifest entry: a data file path (relative to the table root),
    * its row count, and per-column (min, max) ranges — the file-skipping
    * stats a table format stores. `rows = -1` means "not collected"
    * (stats-less commits and legacy manifests); a column absent from
    * `stats` (never collected, or all-null in the file) is conservatively
    * un-prunable. Ranges are doubles: exact for the integral and float
    * columns skipping targets (longs up to 2^53), and min/max pruning
    * only ever needs ordering, not identity.
    *
    * `kind` is `"data"` for ordinary data files and `"dv"` for an
    * EQUALITY-DELETE file (round 15 — the Iceberg-v2 merge-on-read
    * tombstone under the log, see [[commitDeleteMor]]): a one-column
    * parquet of keys whose column name IS the delete key; it kills rows
    * in data files from EARLIER commit versions (the path's `v{n}/`
    * prefix orders them), which is what lets appends after the delete
    * re-ingest a key without resurrection games.
    */
  final case class FileEntry(path: String, rows: Long,
                             stats: Map[String, (Double, Double)],
                             kind: String = "data")

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
    * manifest is a rewrite or addition in its partition). Manifests are
    * written atomically, so both reads here see complete file lists.
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

  /** TIMESTAMP AS OF time travel: the newest version whose manifest
    * landed at or before `tsMillis` (the atomically-moved manifest's
    * mtime IS its commit instant), or −1 if nothing had committed yet.
    * Resolution is the filesystem's mtime granularity — production logs
    * store the instant in the manifest; the mtime is the minimal honest
    * equivalent for this layer.
    */
  def versionAsOf(table: String, tsMillis: Long): Int =
    manifestVersions(table)
      .filter(v => Files.getLastModifiedTime(manifestPath(table, v))
        .toMillis <= tsMillis)
      .foldLeft(-1)(math.max)

  /** Files (relative to `table`) making up `version`'s snapshot. */
  def filesOf(table: String, version: Int): Seq[String] =
    entriesOf(table, version).map(_.path)

  /** Manifest entries (path + rows + column stats) of `version`. */
  def entriesOf(table: String, version: Int): Seq[FileEntry] = {
    val p = manifestPath(table, version)
    require(Files.isRegularFile(p), s"no manifest for v$version")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(parseEntry).toSeq
  }

  /** The `(appId, batchId)` transaction marker commit `version` carries,
    * if it was produced by an idempotent streaming sink ([[appendSink]]).
    */
  def txnOf(table: String, version: Int): Option[(String, Long)] = {
    val p = manifestPath(table, version)
    require(Files.isRegularFile(p), s"no manifest for v$version")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim)
      .collectFirst { case l if l.startsWith("#txn\t") =>
        val Array(_, app, b) = l.split('\t')
        (app, b.toLong)
      }
  }

  /** Highest batchId `appId` has committed among SURVIVING manifests
    * (−1 if none) — the replay fence of [[appendSink]]. Retention
    * caveat, same as Delta's txn retention: a vacuum that removed every
    * one of an app's manifests forgets its progress; keep retention
    * above the maximum replay horizon.
    */
  def lastCommittedBatch(table: String, appId: String): Long =
    manifestVersions(table)
      .flatMap(v => txnOf(table, v))
      .collect { case (a, b) if a == appId => b }
      .foldLeft(-1L)(math.max)

  // manifest line codec: `path` (legacy, no stats),
  // `path<TAB>rows<TAB>col=min,max;col=min,max` (statsStr may be empty),
  // or `path<TAB>rows<TAB>stats<TAB>kind` for non-data entries.
  // Parquet part-file names never contain tabs; stat column names are
  // validated against the separators at commit time.
  private[graft] def parseEntry(line: String): FileEntry = {
    def parseStats(s: String): Map[String, (Double, Double)] =
      s.split(';').iterator.filter(_.nonEmpty).map { kv =>
        val Array(c, mm) = kv.split('=')
        val Array(mn, mx) = mm.split(',')
        c -> (mn.toDouble, mx.toDouble)
      }.toMap
    line.split('\t') match {
      case Array(p) => FileEntry(p, -1L, Map.empty)
      case Array(p, r) => FileEntry(p, r.toLong, Map.empty)
      case Array(p, r, s) => FileEntry(p, r.toLong, parseStats(s))
      case Array(p, r, s, k) => FileEntry(p, r.toLong, parseStats(s), k)
      case _ => throw new IllegalArgumentException(s"bad manifest line: $line")
    }
  }

  private[graft] def renderEntry(e: FileEntry): String = {
    val s = e.stats.toSeq.sortBy(_._1)
      .map { case (c, (mn, mx)) => s"$c=$mn,$mx" }.mkString(";")
    if (e.kind != "data") s"${e.path}\t${e.rows}\t$s\t${e.kind}"
    else if (e.rows < 0 && e.stats.isEmpty) e.path
    else s"${e.path}\t${e.rows}\t$s"
  }

  /** The commit version a manifest path belongs to (its `v{n}/` prefix). */
  private def versionOfPath(p: String): Int =
    p.takeWhile(_ != '/').stripPrefix("v").toInt

  /** The `partCol=value` a relative data-file path belongs to. */
  private def partOf(f: String): Option[String] =
    f.split('/').find(_.startsWith(s"$PartDir="))
      .map(_.stripPrefix(s"$PartDir="))

  private def listDataFiles(spark: SparkSession, dir: String,
      base: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // qualify so both sides carry the same scheme — an unqualified base
    // URI refuses to relativize a `file:`-schemed listing
    val baseUri = fs.makeQualified(
      new org.apache.hadoop.fs.Path(base)).toUri
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += baseUri.relativize(f.getPath.toUri).getPath
    }
    out.result().sorted
  }

  /** Write `df` under `$table/$dirName` partitioned by `partCol` and
    * return its [[FileEntry]] list with paths RELATIVE TO `dirName`.
    * With `statsCols`, one extra distributed pass over just the written
    * files (bounded by the batch, O(files) driver rows) records per-file
    * row counts and column min/max for the manifest. `sortCols` sorts
    * within each partition's writer task (each partition value lands
    * wholly in one task via the repartition) — the z-clustering hook.
    */
  private def writeStageFiles(spark: SparkSession, table: String,
      dirName: String, df: DataFrame, partCol: String,
      statsCols: Seq[String], sortCols: Seq[Column] = Nil): Seq[FileEntry] = {
    statsCols.foreach(c => require(!c.exists("\t;,=".contains(_)),
      s"stat column name '$c' collides with the manifest codec"))
    val keyed = df.withColumn(PartDir, col(partCol).cast("string"))
      .repartition(col(PartDir))
    val clustered =
      if (sortCols.isEmpty) keyed
      else keyed.sortWithinPartitions(col(PartDir) +: sortCols: _*)
    clustered.write.mode("overwrite").partitionBy(PartDir)
      .parquet(s"$table/$dirName")
    statEntries(spark, s"$table/$dirName", statsCols)
  }

  /** Manifest entries for every data file under `dir` (paths relative to
    * `dir`). Stats come from the parquet FOOTERS the write just produced
    * — O(files) driver-side metadata reads, the Iceberg manifest-building
    * approach — instead of a second distributed scan over the committed
    * bytes (guide §1.2). A file whose footer can't answer for some
    * requested column (encoded logical type, missing statistics) falls
    * back to one distributed pass over just that file's data, so the
    * recorded ranges are always exactly what the scan-based pass
    * produced (TxLogSpec pins footer ≡ scan on the events shape).
    */
  private def statEntries(spark: SparkSession, dir: String,
      statsCols: Seq[String]): Seq[FileEntry] = {
    val rel = listDataFiles(spark, dir, dir)
    if (statsCols.isEmpty) return rel.map(FileEntry(_, -1L, Map.empty))
    val conf = spark.sessionState.newHadoopConf()
    rel.map { p =>
      val file = new org.apache.hadoop.fs.Path(s"$dir/$p")
      graft.util.Footers.fileStats(conf, file, statsCols) match {
        case Some((rows, stats)) => FileEntry(p, rows, stats)
        case None =>
          val df = spark.read.parquet(s"$dir/$p")
          val aggs = statsCols.flatMap(c => Seq(
            min(col(c).cast("double")).as(s"__mn_$c"),
            max(col(c).cast("double")).as(s"__mx_$c")))
          val r = df.agg(count(lit(1)).as("__rows"), aggs: _*).collect()(0)
          val stats = statsCols.flatMap { c =>
            val mn = r.getAs[Any](s"__mn_$c")
            val mx = r.getAs[Any](s"__mx_$c")
            // an all-null column has no range: leave it un-prunable
            if (mn == null || mx == null) None
            else Some(c -> (mn.asInstanceOf[Double], mx.asInstanceOf[Double]))
          }.toMap
          FileEntry(p, r.getAs[Long]("__rows"), stats)
      }
    }
  }

  /** Land a manifest atomically: temp name in `_vlog`, then ATOMIC_MOVE
    * to `v{n}.json` — a reader (or a racing writer's conflict check)
    * only ever sees a complete manifest, never a partially-written one.
    */
  private def writeManifest(table: String, version: Int,
      entries: Seq[FileEntry],
      txn: Option[(String, Long)] = None): Unit = {
    val dir = Paths.get(s"$table/_vlog")
    Files.createDirectories(dir)
    val tmp = dir.resolve(
      s".v$version.tmp-${java.util.UUID.randomUUID()}")
    val header = txn.map { case (app, b) => s"#txn\t$app\t$b\n" }
      .getOrElse("")
    Files.write(tmp,
      (header + entries.sortBy(_.path).map(renderEntry)
        .mkString("", "\n", "\n")).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(table, version),
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def deleteRecNio(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala.toSeq.foreach(deleteRecNio)
      finally stream.close()
    }
    Files.deleteIfExists(p); ()
  }

  /** Commit `df` as version 0 (the initial snapshot). `statsCols` opts
    * into per-file column min/max in the manifest (see [[FileEntry]]).
    */
  def commitInitial(spark: SparkSession, table: String, df: DataFrame,
      partCol: String, statsCols: Seq[String] = Nil): Int = {
    writeManifest(table, 0,
      writeStageFiles(spark, table, "v0", df, partCol, statsCols)
        .map(e => e.copy(path = s"v0/${e.path}")))
    0
  }

  /** Write `df` to `stageDir` in exactly the physical layout
    * [[commitInitial]] lands (the `__part`-partitioned file set, no
    * manifest, no log) — the staging half of the clone-initial pattern:
    * a caller creating MANY tables from the SAME initial snapshot (CI
    * fixtures, a branch/fork workflow, the bench's ten warehouse
    * operators over one events table) pays the distributed write once
    * and clones it per table with [[commitInitialFrom]].
    */
  def stageInitial(spark: SparkSession, stageDir: String, df: DataFrame,
      partCol: String): Unit = {
    df.withColumn(PartDir, col(partCol).cast("string"))
      .repartition(col(PartDir))
      .write.mode("overwrite").partitionBy(PartDir).parquet(stageDir)
  }

  /** [[commitInitial]] from a directory previously written by
    * [[stageInitial]]: hardlink-clone the staged files into `$table/v0`
    * (no data bytes move; every later commit writes NEW files, so the
    * clone can never alias a mutation) and land the v0 manifest. Stats
    * come from the cloned files' footers ([[statEntries]]) — identical
    * values to a fresh [[commitInitial]] with the same `statsCols`
    * (TxLogSpec pins the equivalence).
    */
  def commitInitialFrom(spark: SparkSession, table: String,
      stagedDir: String, statsCols: Seq[String] = Nil): Int = {
    val dest = s"$table/v0"
    graft.util.FsTrees.deleteTree(dest)
    graft.util.FsTrees.linkTree(stagedDir, dest)
    writeManifest(table, 0,
      statEntries(spark, dest, statsCols)
        .map(e => e.copy(path = s"v0/${e.path}")))
    0
  }

  /** Commit an upsert of `batch` (REPLACE matching `keyCol` rows within
    * the touched partitions, append new ones) as the next version.
    * Untouched partitions' files carry over into the new manifest BY
    * REFERENCE; only the touched partitions are read back, merged, and
    * rewritten as fresh files. Prior versions' data files are never
    * modified or deleted — `readVersion(cur)` keeps returning the exact
    * old snapshot after this commit (TxLogSpec pins it).
    */
  def commitUpsert(spark: SparkSession, table: String, batch: DataFrame,
      keyCol: String, partCol: String, statsCols: Seq[String] = Nil): Int =
    commitUpsertFrom(spark, table, batch, keyCol, partCol,
      currentVersion(table), statsCols = statsCols)

  /** [[commitUpsert]] with an explicit snapshot version the merge was
    * computed against — the OPTIMISTIC-concurrency core (round 14;
    * VERDICT r13 #2). Protocol, the minimal Delta/Iceberg commit:
    *
    *  1. merge is prepared against v(start)'s snapshot (pruned read +
    *     anti join) and STAGED to a uuid-named directory invisible to
    *     readers and vacuum — all the heavy work happens before any
    *     claim is taken;
    *  2. re-read the log head; every commit that landed after `start`
    *     is conflict-checked — its touched partitions (recovered from
    *     the manifest diff) must be DISJOINT from ours, else
    *     [[CommitConflictException]] (retryable — no lost update: the
    *     overlapping writer's rows are not silently resurrected from
    *     our stale snapshot). The check also runs BEFORE staging, so a
    *     doomed commit fails before paying the write;
    *  3. atomically claim head+1 via CREATE_NEW of a transient
    *     `.claim` file — two racers on the same number serialize here:
    *     the loser waits for the winner's manifest to land, re-checks
    *     conflicts against it, and claims the next number;
    *  4. rename the staged directory to the claimed `v{n}` and land the
    *     manifest (kept entries carry over from the HEAD manifest — NOT
    *     `start`'s: a disjoint intervener's files must be referenced).
    *     The claim spans only this rename + one small file write.
    *
    * Disjoint racers both land, linearized; overlapping racers — exactly
    * one wins (TxLogSpec pins both). A claim orphaned by a crashed
    * writer stalls peers until `claimTimeoutMs`, then fails loudly
    * (remove the stale `.claim` by hand — the honest minimal answer;
    * production logs lease-expire claims).
    */
  private[graft] def commitUpsertFrom(spark: SparkSession, table: String,
      batch: DataFrame, keyCol: String, partCol: String, start: Int,
      claimTimeoutMs: Long = 60000L, statsCols: Seq[String] = Nil): Int = {
    require(start >= 0, "commitInitial first")
    // manifest fragments carry Spark's partition-path ESCAPING
    // ('a:b' → 'a%3Ab'; spaces pass through unescaped) and render a
    // null partition as the
    // __HIVE_DEFAULT_PARTITION__ sentinel; compare against those exact
    // forms, or a special-char (or null) partition would land in
    // keptFiles AND be rewritten — duplicating every upserted row in the
    // new snapshot
    val touched = batch.select(col(partCol).cast("string")).distinct()
      .collect().map(r => escapedPart(r)).toSet
    // the base read is MoR-aware: any equality-delete files in the
    // snapshot apply BEFORE the merge, so a rewrite can never carry a
    // dead row into a higher version (out of the deletes' range)
    val touchedData = dataEntriesOf(table, start)
      .filter(e => partOf(e.path).exists(touched.contains))
    val dataCols = batch.columns.filterNot(_ == PartDir)
    val merged =
      if (touchedData.isEmpty) batch.select(dataCols.map(col): _*)
      else {
        val base = morRead(spark, table, touchedData,
            delEntriesOf(table, start))
          .select(dataCols.map(col): _*)
        batch.select(dataCols.map(col): _*)
          .unionByName(base.join(
            batch.select(col(keyCol)).distinct(), Seq(keyCol),
            "left_anti"))
      }
    occCommit(table, start, touched, claimTimeoutMs)(d =>
      writeStageFiles(spark, table, d, merged, partCol, statsCols))
  }

  /** Schema-EVOLVING upsert ([[Cow.mergeCowEvolve]] under the log,
    * round 15): the batch may carry columns the snapshot lacks (and
    * vice versa) — touched partitions rewrite under the UNION schema
    * (missing sides null-filled via unionByName), untouched files keep
    * their old schema by reference, and [[readVersion]] reads with
    * parquet schema merging so every version presents its own union
    * schema. Old versions are untouched: time travel to v(n−1) still
    * shows the pre-evolution columns only. Same OCC contract as
    * [[commitUpsertFrom]].
    */
  def commitUpsertEvolve(spark: SparkSession, table: String,
      batch: DataFrame, keyCol: String, partCol: String,
      statsCols: Seq[String] = Nil): Int =
    commitUpsertEvolveFrom(spark, table, batch, keyCol, partCol,
      currentVersion(table), statsCols = statsCols)

  private[graft] def commitUpsertEvolveFrom(spark: SparkSession,
      table: String, batch: DataFrame, keyCol: String, partCol: String,
      start: Int, claimTimeoutMs: Long = 60000L,
      statsCols: Seq[String] = Nil): Int = {
    require(start >= 0, "commitInitial first")
    val touched = batch.select(col(partCol).cast("string")).distinct()
      .collect().map(r => escapedPart(r)).toSet
    val touchedData = dataEntriesOf(table, start)
      .filter(e => partOf(e.path).exists(touched.contains))
    val batchData = batch.drop(PartDir)
    val merged =
      if (touchedData.isEmpty) batchData
      else {
        val base = morRead(spark, table, touchedData,
          delEntriesOf(table, start))
        batchData.unionByName(
          base.join(batchData.select(col(keyCol)).distinct(),
            Seq(keyCol), "left_anti"),
          allowMissingColumns = true)
      }
    occCommit(table, start, touched, claimTimeoutMs)(d =>
      writeStageFiles(spark, table, d, merged, partCol, statsCols))
  }

  private def escapedPart(r: org.apache.spark.sql.Row): String = {
    val catalog = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    if (r.isNullAt(0)) catalog.DEFAULT_PARTITION_NAME
    else catalog.escapePathName(r.getString(0))
  }

  private def conflictCheck(table: String, start: Int,
      touched: Set[String]): Unit = {
    val head = currentVersion(table)
    (start + 1) to head foreach { v =>
      val overlap = touchedPartitionsOf(table, v).intersect(touched)
      if (overlap.nonEmpty)
        throw new CommitConflictException(
          s"commit v$v touched partition(s) ${overlap.mkString(",")} " +
            s"concurrently with this commit (snapshot v$start) — " +
            "re-read and retry")
      // an equality-delete file has no partition footprint — it kills
      // rows in ANY partition — so every rewrite prepared before it
      // must re-read (its staged files would otherwise resurrect the
      // deleted rows at a higher version, out of delete range)
      val prevPaths = filesOf(table, v - 1).toSet
      if (entriesOf(table, v)
          .exists(e => e.kind == "dv" && !prevPaths(e.path)))
        throw new CommitConflictException(
          s"commit v$v added an equality-delete file concurrently " +
            s"with this rewrite (snapshot v$start) — re-read and retry")
    }
  }

  /** The shared OCC commit core. Stages data files FIRST (uuid dir,
    * invisible to readers/vacuum), then conflict-checks + claims head+1
    * atomically, renames the staged dir to `v{n}`, lands the manifest
    * (kept entries from the HEAD manifest minus the touched partitions),
    * and releases. The claim is held only across the rename + manifest
    * write — never across the Spark write, so a large commit cannot
    * starve peers into claim timeouts. `blindAppend` (Delta append
    * semantics) skips the conflict check and keeps EVERY head file.
    */
  private def occCommit(table: String, start: Int, touched: Set[String],
      claimTimeoutMs: Long, blindAppend: Boolean = false,
      txn: Option[(String, Long)] = None,
      dropDeleteEntries: Boolean = false)
      (stage: String => Seq[FileEntry]): Int = {
    // fail fast before paying the staged write; the authoritative check
    // re-runs after staging, against whatever landed meanwhile
    if (!blindAppend) conflictCheck(table, start, touched)
    val stageDir = s"stage-${java.util.UUID.randomUUID()}"
    var next = -1
    var renamed = false
    try {
      val staged = stage(stageDir)
      val deadline = System.currentTimeMillis() + claimTimeoutMs
      while (next < 0) {
        if (!blindAppend) conflictCheck(table, start, touched)
        val head = currentVersion(table)
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
            s"claim on v${head + 1} of $table held or stale after " +
              s"$claimTimeoutMs ms — a concurrent writer is landing its " +
              "manifest, or a crashed writer left the claim file behind " +
              "(remove it by hand to recover)")
        } else Thread.sleep(25)
      }
      // the claim holder owns v{next} exclusively: a directory orphaned
      // there by a writer that crashed between rename and manifest write
      // is dead weight — clear it so our rename cannot collide
      val target = Paths.get(s"$table/v$next")
      if (Files.exists(target)) deleteRecNio(target)
      // a manifest-only commit (e.g. a purge whose deletes matched
      // nothing) stages no files and has no directory to rename
      if (Files.exists(Paths.get(s"$table/$stageDir"))) {
        Files.move(Paths.get(s"$table/$stageDir"), target)
        renamed = true
      }
      val landed = staged.map(e => e.copy(path = s"v$next/${e.path}"))
      val kept0 =
        if (blindAppend) entriesOf(table, next - 1)
        else entriesOf(table, next - 1)
          .filterNot(e => partOf(e.path).exists(touched.contains))
      val kept =
        if (dropDeleteEntries) kept0.filterNot(_.kind == "dv") else kept0
      writeManifest(table, next, kept ++ landed, txn)
      next
    } catch {
      case e: Throwable =>
        // normal-abort hygiene: a conflict or failed stage leaves no
        // orphan (crash orphans are vacuum(staleStageMs)'s job)
        if (!renamed) deleteRecNio(Paths.get(s"$table/$stageDir"))
        throw e
    } finally {
      if (next >= 0) releaseClaim(table, next)
    }
  }

  /** Blind APPEND commit — the streaming-ingest fast path, Delta's
    * append semantics: new files land in the batch's partitions, every
    * existing file carries over by reference, and appends NEVER conflict
    * (two stale-snapshot appends to the same partition both land — rows
    * are only added, so neither can lose the other's). They still
    * linearize through the claim, and a later REWRITE (upsert / delete /
    * optimize) prepared against a snapshot that predates an append to
    * its partitions aborts with the usual conflict — the manifest diff
    * shows the appended files. This is also how small files accumulate
    * in real tables; [[commitOptimize]] is the cure.
    */
  def commitAppend(spark: SparkSession, table: String, batch: DataFrame,
      partCol: String, statsCols: Seq[String] = Nil,
      claimTimeoutMs: Long = 60000L,
      txn: Option[(String, Long)] = None): Int = {
    val start = currentVersion(table)
    require(start >= 0, "commitInitial first")
    occCommit(table, start, Set.empty, claimTimeoutMs,
      blindAppend = true, txn = txn)(d =>
      writeStageFiles(spark, table, d, batch, partCol, statsCols))
  }

  /** MERGE-ON-READ equality DELETE — the Iceberg-v2 delete-file commit
    * (round 15), the log-integrated successor of the directory-level
    * [[Dv]] surface: the commit lands the distinct keys as delete
    * files (one per 32M keys — a single file in the normal regime,
    * never one writer task funneling a huge batch; the column name IS
    * the key) and touches ZERO base files, so delete cost is O(batch)
    * against a 100 TB table.
    * [[readVersion]] applies it by version order (kills rows written
    * BEFORE the delete only), which makes the semantics compose
    * cleanly with the rest of the taxonomy:
    *  - a later [[commitAppend]] re-ingesting a deleted key SURVIVES
    *    (its rows are newer than the delete);
    *  - appends never conflict with a delete in flight — version order
    *    resolves either interleaving to a serial history;
    *  - a REWRITE prepared before the delete landed aborts retryably
    *    (the delete has no partition footprint, so [[conflictCheck]]
    *    treats it as touching everything — a stale rewrite would
    *    resurrect victims into a higher version);
    *  - [[commitPurgeMor]] folds accumulated delete files into a
    *    partition-pruned rewrite and drops them from the manifest.
    * Prior versions still time-travel to their pre-delete state.
    */
  def commitDeleteMor(spark: SparkSession, table: String,
      keys: DataFrame, keyCol: String,
      claimTimeoutMs: Long = 60000L): Int = {
    val start = currentVersion(table)
    require(start >= 0, "commitInitial first")
    occCommit(table, start, Set.empty, claimTimeoutMs,
      blindAppend = true) { d =>
      val k = keys.select(col(keyCol)).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // size the delete file count to the batch — one file for the
        // normal case, never a single writer task funneling a massive
        // batch (32M 8-byte keys ≈ a 256 MB parquet file)
        val n = k.count()
        val maxKeysPerFile = 32L << 20
        val nFiles = math.max(1L,
          (n + maxKeysPerFile - 1) / maxKeysPerFile).toInt
        k.repartition(nFiles).write.mode("overwrite")
          .parquet(s"$table/$d")
        // record EXACT per-file key counts: [[morRead]]'s
        // broadcast-vs-shuffle gate sums them off the manifest. Counts
        // come from the written files' footers (structural metadata, one
        // driver-side read per file) — no re-scan of the keys just
        // written (guide §1.2).
        val conf = spark.sessionState.newHadoopConf()
        listDataFiles(spark, s"$table/$d", s"$table/$d")
          .map(p => FileEntry(p, graft.util.Footers.rowCount(conf,
            new org.apache.hadoop.fs.Path(s"$table/$d/$p")), Map.empty,
            kind = "dv"))
      } finally { k.unpersist(); () }
    }
  }

  /** Fold every accumulated equality-delete file into a copy-on-write
    * rewrite of the key-BEARING partitions only (discovered by one
    * MoR-aware semi join), and drop the delete entries from the new
    * manifest — the [[Dv.purge]] of the versioned world, restoring
    * zero-tax reads. Partitions the victims never lived in carry by
    * reference. A log with no delete files commits nothing.
    */
  def commitPurgeMor(spark: SparkSession, table: String,
      partCol: String, statsCols: Seq[String] = Nil,
      claimTimeoutMs: Long = 60000L): Int = {
    val start = currentVersion(table)
    require(start >= 0, "commitInitial first")
    val dels = delEntriesOf(table, start)
    if (dels.isEmpty) return start
    val dataE = dataEntriesOf(table, start)
    // partitions holding any TO-BE-DELETED row: the raw read minus the
    // MoR read, keyed by partition — equivalently, partitions whose raw
    // row count differs. One semi-join-shaped pass: raw rows whose key
    // matches a delete key STRICTLY NEWER than the row's version.
    val byKey = dels.groupBy(e =>
      spark.read.parquet(s"$table/${e.path}").schema.fields.head.name)
    val raw = dataE.groupBy(e => versionOfPath(e.path)).toSeq
      // per-version groups are schema-homogeneous (morRead scaladoc) —
      // no mergeSchema footer sweep; cross-version drift merges in the
      // unionByName
      .map { case (v, es) => spark.read
        .parquet(es.map(e => s"$table/${e.path}"): _*)
        .withColumn("__v", lit(v)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val touched = byKey.iterator.flatMap { case (k, es) =>
      val delKeys = es.groupBy(e => versionOfPath(e.path)).toSeq
        .map { case (vd, des) =>
          spark.read.parquet(des.map(e => s"$table/${e.path}"): _*)
            .select(col(k).as("__delk")).withColumn("__vd", lit(vd)) }
        .reduce(_ unionByName _)
        .groupBy(col("__delk")).agg(max(col("__vd")).as("__vmax"))
      raw.join(broadcast(delKeys), raw(k) === col("__delk"))
        .filter(col("__vmax") > col("__v"))
        .select(col(partCol).cast("string")).distinct()
        .collect().map(r => escapedPart(r))
    }.toSet
    if (touched.isEmpty)
      // deletes matched nothing: commit a manifest without them
      return occCommit(table, start, Set.empty, claimTimeoutMs,
        dropDeleteEntries = true)(_ => Nil)
    val touchedData = dataE
      .filter(e => partOf(e.path).exists(touched.contains))
    val survivors = morRead(spark, table, touchedData, dels)
    occCommit(table, start, touched, claimTimeoutMs,
      dropDeleteEntries = true)(d =>
      writeStageFiles(spark, table, d, survivors, partCol, statsCols))
  }

  /** Idempotent STREAMING ingest sink — the Delta `foreachBatch` +
    * txn-marker pattern: each micro-batch lands as ONE blind-append
    * commit whose manifest records `(appId, batchId)` ATOMICALLY with
    * the file list, and a batch REPLAYED after a failure (Spark's
    * foreachBatch delivers at-least-once) is recognized by
    * [[lastCommittedBatch]] and skipped — exactly-once APPEND at the
    * commit level. An empty log bootstraps with the first batch as v0.
    * Wire as `df.writeStream.foreachBatch(TxLog.appendSink(...))`.
    */
  def appendSink(table: String, partCol: String, appId: String,
      statsCols: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      if (batchId <= lastCommittedBatch(table, appId)) ()
      else if (currentVersion(table) < 0) {
        writeManifest(table, 0,
          writeStageFiles(batch.sparkSession, table, "v0", batch,
            partCol, statsCols).map(e => e.copy(path = s"v0/${e.path}")),
          Some((appId, batchId)))
      } else {
        commitAppend(batch.sparkSession, table, batch, partCol,
          statsCols, txn = Some((appId, batchId)))
        ()
      }
    }

  /** OPTIMIZE as an OCC commit — a rewrite that changes the physical
    * layout and NOT the data: the selected partitions (default: all)
    * are read back, optionally z-clustered on `zorder` (k ≥ 2 columns →
    * [[Layout.zValueK]]; one column → a plain sort), compacted to one
    * file per partition, and committed under the SAME conflict contract
    * as any rewrite: OPTIMIZE vs a disjoint upsert both land; OPTIMIZE
    * vs an overlapping upsert — exactly one aborts retryably (the data
    * it rewrote is no longer the truth). Every prior version stays
    * readable; `readVersion` before and after are row-identical
    * (TxLogSpec pins it). Stats refresh with the rewrite when
    * `statsCols` is given — compaction is exactly when ranges tighten.
    * Returns the new version, or the current head when the selection
    * matches no files.
    *
    * `partitions` takes RAW partition values (escaped internally, same
    * as upsert batches); None optimizes the whole table — at 100 TB
    * pass the small-file partitions a manifest scan identifies.
    */
  def commitOptimize(spark: SparkSession, table: String, partCol: String,
      partitions: Option[Set[String]] = None, zorder: Seq[String] = Nil,
      statsCols: Seq[String] = Nil): Int =
    commitOptimizeFrom(spark, table, partCol, partitions, zorder,
      statsCols, currentVersion(table))

  private[graft] def commitOptimizeFrom(spark: SparkSession,
      table: String, partCol: String, partitions: Option[Set[String]],
      zorder: Seq[String], statsCols: Seq[String], start: Int,
      claimTimeoutMs: Long = 60000L): Int = {
    require(start >= 0, "commitInitial first")
    val catalog = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val dataE = dataEntriesOf(table, start)
    val present = dataE.flatMap(e => partOf(e.path)).toSet
    val touched = partitions
      .map(_.map(v => if (v == null) catalog.DEFAULT_PARTITION_NAME
        else catalog.escapePathName(v)))
      .getOrElse(present)
      .intersect(present)
    val touchedData = dataE
      .filter(e => partOf(e.path).exists(touched.contains))
    if (touchedData.isEmpty) return currentVersion(table)
    // MoR-aware: the rewrite folds any equality deletes for the
    // selected partitions; a WHOLE-table optimize therefore also drops
    // the delete entries (nothing they could still apply to), while a
    // partial one must keep them for the unselected partitions
    val base = morRead(spark, table, touchedData,
      delEntriesOf(table, start))
    val sortCols: Seq[Column] = zorder match {
      case Nil => Nil
      case Seq(c) => Seq(col(c))
      case cs => Seq(Layout.zValueK(cs.map(col)))
    }
    occCommit(table, start, touched, claimTimeoutMs,
      dropDeleteEntries = touched == present)(d =>
      writeStageFiles(spark, table, d, base, partCol, statsCols,
        sortCols = sortCols))
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
      keyCol: String, partCol: String, statsCols: Seq[String] = Nil): Int =
    commitDeleteFrom(spark, table, keys, keyCol, partCol,
      currentVersion(table), statsCols = statsCols)

  private[graft] def commitDeleteFrom(spark: SparkSession, table: String,
      keys: DataFrame, keyCol: String, partCol: String, start: Int,
      claimTimeoutMs: Long = 60000L, statsCols: Seq[String] = Nil): Int = {
    require(start >= 0, "commitInitial first")
    // a legitimately-empty snapshot (a prior delete removed every row)
    // holds nothing to delete — and a zero-path parquet read would throw
    if (dataEntriesOf(table, start).isEmpty) return currentVersion(table)
    val k = keys.select(col(keyCol)).distinct()
    // data files carry the original partCol (only the duplicated
    // __part copy went to the directory names), so the touched list
    // comes straight off the MoR-read snapshot rows
    val base = readVersion(spark, table, start)
    val touched = base.join(k, Seq(keyCol), "left_semi")
      .select(col(partCol).cast("string")).distinct()
      .collect().map(r => escapedPart(r)).toSet
    if (touched.isEmpty) return currentVersion(table)
    val touchedData = dataEntriesOf(table, start)
      .filter(e => partOf(e.path).exists(touched.contains))
    val survivors = morRead(spark, table, touchedData,
        delEntriesOf(table, start))
      .join(k, Seq(keyCol), "left_anti")
    occCommit(table, start, touched, claimTimeoutMs)(d =>
      writeStageFiles(spark, table, d, survivors, partCol, statsCols))
  }

  /** Delete-row budget under which [[morRead]] BROADCASTS the delete
    * set (the normal between-purge regime — map-only probe); beyond it
    * the anti-join side falls back to a shuffle-hash join — slower,
    * correct, and a signal the purge is overdue. The same size-gate
    * discipline as [[Dv.read]]'s (an unconditional broadcast of a
    * neglected delete set is a driver OOM at scale). Entries with
    * unknown row counts (−1) are conservatively treated as large.
    */
  private val MorBroadcastMaxRows = 4L << 20

  /** The MERGE-ON-READ core: data files banded by their commit version
    * (`v{n}/` path prefix), equality-delete files applied by version
    * order — a delete committed at vd kills rows written at v < vd, so
    * a later append legitimately re-ingests a deleted key. Each delete
    * file's single column names its key; delete sets broadcast while
    * small ([[MorBroadcastMaxRows]], known from the manifest's per-file
    * row counts — [[commitPurgeMor]] folds them before they outgrow
    * it), shuffle-hash beyond. With no delete entries this degenerates
    * to one plain multi-file scan, zero extra plan nodes.
    */
  private def morRead(spark: SparkSession, table: String,
      dataEntries: Seq[FileEntry],
      delEntries: Seq[FileEntry]): DataFrame = {
    if (dataEntries.isEmpty) return spark.emptyDataFrame
    // files under one v{n}/ prefix were written by ONE
    // writeStageFiles/stageInitial call and share a schema EXACTLY, so
    // each version group reads plain (schema from a single footer);
    // schema evolution only happens ACROSS versions, which the
    // unionByName(allowMissingColumns) below already merges. The
    // previous mergeSchema=true paid a distributed footer sweep over
    // every file on every snapshot read for a merge that could never
    // differ within a group (guide §1.2).
    def read(es: Seq[FileEntry]) = spark.read
      .parquet(es.map(e => s"$table/${e.path}"): _*)
    val groups = dataEntries.groupBy(e => versionOfPath(e.path)).toSeq
      .sortBy(_._1)
    if (delEntries.isEmpty)
      return groups.map { case (_, es) => read(es) }
        .reduce(_.unionByName(_, allowMissingColumns = true))
        .drop(PartDir)
    val data = groups
      .map { case (v, es) => read(es).withColumn("__v", lit(v)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val small = delEntries.forall(_.rows >= 0) &&
      delEntries.map(_.rows).sum <= MorBroadcastMaxRows
    val byKey = delEntries.groupBy(e =>
      spark.read.parquet(s"$table/${e.path}").schema.fields.head.name)
    val out = byKey.foldLeft(data) { case (cur, (k, es)) =>
      val dels0 = es.groupBy(e => versionOfPath(e.path)).toSeq
        .map { case (vd, des) =>
          spark.read.parquet(des.map(e => s"$table/${e.path}"): _*)
            .select(col(k).as("__delk")).withColumn("__vd", lit(vd))
        }
        .reduce(_ unionByName _)
        .groupBy(col("__delk")).agg(max(col("__vd")).as("__vmax"))
      val dels = if (small) broadcast(dels0) else dels0.hint("shuffle_hash")
      cur.join(dels, cur(k) === col("__delk"), "left")
        .filter(col("__vmax").isNull || col("__vmax") <= col("__v"))
        .drop("__delk", "__vmax")
    }
    out.drop("__v", PartDir)
  }

  private def dataEntriesOf(table: String, version: Int): Seq[FileEntry] =
    entriesOf(table, version).filter(_.kind == "data")
  private def delEntriesOf(table: String, version: Int): Seq[FileEntry] =
    entriesOf(table, version).filter(_.kind == "dv")

  /** Read the table AS OF `version` (time travel), with any equality-
    * delete files applied ([[morRead]]). An empty snapshot (every row
    * deleted) reads as a zero-column empty DataFrame — the minimal log
    * stores no schema of its own.
    */
  def readVersion(spark: SparkSession, table: String,
      version: Int): DataFrame =
    morRead(spark, table, dataEntriesOf(table, version),
      delEntriesOf(table, version))

  /** Change-data-feed between two committed versions — Delta's
    * `table_changes` shape, computed from the snapshots themselves via
    * the [[TimeSeries.cdcExtract]] full-outer diff (op ∈ I/U/D, payload
    * nulled on D). The manifest makes it scale: a partition whose file
    * set is IDENTICAL in both manifests (files carried by reference)
    * cannot contain a change, so both sides read ONLY the partitions
    * whose references differ — cost bounded by the intervening commits'
    * touched partitions, never the table. No changelog is stored; the
    * feed falls out of the snapshot algebra.
    */
  def tableChanges(spark: SparkSession, table: String, fromV: Int,
      toV: Int, keyCol: String, payload: Seq[String]): DataFrame = {
    val fromData = dataEntriesOf(table, fromV)
    val toData = dataEntriesOf(table, toV)
    // equality-delete files have no partition footprint: if the two
    // manifests' delete sets differ, the reference diff cannot prune —
    // fall back to the full snapshots (the purge that fixes this also
    // rewrites the victims' partitions, restoring prunability)
    val delsDiffer = delEntriesOf(table, fromV).map(_.path).toSet !=
      delEntriesOf(table, toV).map(_.path).toSet
    val fromFiles = fromData.map(_.path).toSet
    val toFiles = toData.map(_.path).toSet
    val changedParts =
      ((fromFiles diff toFiles) ++ (toFiles diff fromFiles)).flatMap(partOf)
    def readParts(v: Int, data: Seq[FileEntry]): DataFrame = {
      val es = if (delsDiffer) data
        else data.filter(e => partOf(e.path).exists(changedParts.contains))
      if (es.isEmpty) readVersion(spark, table, v).filter(lit(false))
      else morRead(spark, table, es, delEntriesOf(table, v))
    }
    TimeSeries.cdcExtract(readParts(fromV, fromData),
      readParts(toV, toData), keyCol, payload)
  }

  /** Incremental consumption of a versioned table — the Delta
    * streaming-source contract in micro-batch form: the data files
    * ADDED since `fromV` (by manifest reference diff), read as one
    * batch with any newer equality-deletes applied. Exact for
    * append-only history (the [[appendSink]] + [[commitAppend]]
    * regime); an intervening REWRITE (upsert / CoW delete / optimize)
    * re-emits rewritten rows and retracts nothing, so the call throws
    * unless `allowRewrites` — the ignoreChanges contract, stated
    * loudly instead of silently double-counting.
    */
  def readAppendsSince(spark: SparkSession, table: String, fromV: Int,
      allowRewrites: Boolean = false): DataFrame = {
    val cur = currentVersion(table)
    val oldPaths = entriesOf(table, fromV).map(_.path).toSet
    val curEntries = entriesOf(table, cur)
    val removed = oldPaths.diff(curEntries.map(_.path).toSet)
    if (removed.nonEmpty && !allowRewrites)
      throw new IllegalStateException(
        s"versions v$fromV..v$cur rewrote ${removed.size} file(s) — an " +
          "appends-only read would re-emit their surviving rows; pass " +
          "allowRewrites = true to accept re-emission")
    val added = curEntries
      .filter(e => e.kind == "data" && !oldPaths(e.path))
    if (added.isEmpty) readVersion(spark, table, cur).filter(lit(false))
    else morRead(spark, table, added, delEntriesOf(table, cur))
  }

  /** The scan-planning prune: which of `version`'s files can possibly
    * hold a row satisfying the conjunction of `bounds` (col BETWEEN lo
    * AND hi), decided from the manifest stats alone — no file opened.
    * A file without stats for a bound column is conservatively kept.
    * Returns (surviving file paths, total file count).
    */
  def prunedFiles(table: String, version: Int,
      bounds: Seq[(String, (Double, Double))]): (Seq[String], Int) = {
    val entries = dataEntriesOf(table, version)
    val kept = entries.filter { e =>
      bounds.forall { case (c, (lo, hi)) =>
        e.stats.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
    (kept.map(_.path), entries.size)
  }

  /** [[readVersion]] restricted to the files [[prunedFiles]] keeps for
    * `bounds` — the Iceberg scan-planning contract: a selective query
    * against a versioned 100 TB table opens only the files whose
    * recorded ranges can match. Pruning is a FILE filter, not a row
    * filter: compose the actual predicate on top (skipped files cannot
    * affect its result — TxLogSpec pins pruned ≡ full under the
    * predicate across versions).
    */
  def readVersionPruned(spark: SparkSession, table: String, version: Int,
      bounds: Seq[(String, (Double, Double))]): DataFrame = {
    val (files, _) = prunedFiles(table, version, bounds)
    if (files.isEmpty)
      // every file pruned: an empty relation with the version's schema
      readVersion(spark, table, version).filter(lit(false))
    else {
      // pruning applies to DATA files; equality-delete files always
      // apply (a pruned scan must never show a deleted row)
      val keep = files.toSet
      morRead(spark, table,
        dataEntriesOf(table, version).filter(e => keep(e.path)),
        delEntriesOf(table, version))
    }
  }

  /** Retention vacuum: keep the newest `retainVersions` snapshots,
    * delete every older manifest and every data file no kept manifest
    * references. Kept versions remain byte-for-byte readable (shared
    * files are reference-counted by the manifest union, never deleted
    * while referenced — TxLogSpec pins it). Returns
    * (dataFilesDeleted, manifestsDeleted).
    *
    * Concurrency: vacuum only ever lists committed `v*` directories, so
    * an IN-FLIGHT commit is safe by construction — its new files live
    * in a `stage-*` directory vacuum never visits, and its kept-file
    * references are the head manifest's files, which `retainVersions ≥
    * 1 always preserves. A writer that CRASHED mid-stage leaves its
    * `stage-*` directory orphaned; pass `staleStageMs ≥ 0` to also
    * delete stage directories not modified within that window (default
    * off, so a live slow writer is never swept).
    */
  def vacuum(spark: SparkSession, table: String,
      retainVersions: Int = 1, staleStageMs: Long = -1L): (Int, Int) = {
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
    if (staleStageMs >= 0) {
      val cutoff = System.currentTimeMillis() - staleStageMs
      val stream = Files.list(Paths.get(table))
      try stream.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("stage-") &&
          Files.getLastModifiedTime(p).toMillis < cutoff)
        .foreach(deleteRecNio)
      finally stream.close()
    }
    (doomed.size, oldManifests.size)
  }
}
