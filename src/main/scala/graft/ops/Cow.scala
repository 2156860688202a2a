package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE/upsert compaction — the WRITE-side sibling of
  * [[TimeSeries.latestSnapshot]]'s merge-on-read: given a partitioned
  * base table and a CDC batch, rewrite ONLY the partitions the batch
  * touches and leave every other partition's files byte-identical
  * (CowSpec asserts exactly that).
  *
  * Scale shape (the lakehouse MERGE every 100 TB deployment pays):
  *  - the touched-partition list comes from ONE distinct over the batch
  *    (bounded by the batch, not the base);
  *  - the base read is partition-PRUNED to the touched list (a static
  *    IN-list partition filter — the scan never opens an untouched
  *    partition's files);
  *  - upsert = batch ∪ (pruned base ⟕anti batch keys) — the anti join
  *    shuffles only touched-partition rows against batch keys;
  *  - the write is Spark's dynamic partition overwrite: each touched
  *    partition is staged and atomically swapped, untouched directories
  *    are never listed, let alone rewritten.
  *
  * The merged frame is localCheckpoint-ed before the write because the
  * output path is also the (pruned) input path — the checkpoint severs
  * the lineage so `InsertIntoHadoopFsRelation`'s read-path check passes;
  * its size is bounded by the TOUCHED partitions, not the table. A
  * production deployment swaps metastore pointers instead; the
  * per-partition staging semantics are the same.
  *
  * Reference context: the reference (563-line pandas pipelines) has no
  * storage layer; this belongs to the warehouse extension surface
  * (SURVEY §2.12), paired with the q104 read-side snapshot.
  */
object Cow {

  /** Upsert `batch` into the partitioned parquet table at `basePath`
    * copy-on-write style. `batch` must carry the table's columns
    * including `partCol`; rows with keys present in the base REPLACE
    * them, new keys append — within the touched partitions only (the
    * caller's batch contract: a key's partition never changes between
    * base and batch, the standard CDC shape where the partition column
    * derives from an immutable event time).
    *
    * Returns the touched partition values (the rewrite audit trail).
    */
  def mergeCow(spark: SparkSession, basePath: String, batch: DataFrame,
      keyCol: String, partCol: String): Seq[Any] = {
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // mergeSchema: after a mergeCowEvolve the table's partitions have
    // heterogeneous schemas — an inferred-schema read can miss a
    // previously-evolved column and silently drop survivors' values for
    // it; the union read makes the batch contract loud instead (the
    // batch must carry every base column, evolved ones included)
    val base = spark.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col(partCol).isin(touched: _*))
    val survivors = base.join(
      batch.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val merged = batch.select(base.columns.map(col): _*)
      .unionByName(survivors.select(base.columns.map(col): _*))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(basePath)
    touched
  }

  /** Schema-EVOLVING copy-on-write merge — [[mergeCow]] when the batch
    * carries columns the base has never seen (the additive schema
    * evolution every long-lived table hits: a new enrichment field
    * arrives with this batch's rows). Output schema in the touched
    * partitions = base ∪ batch columns; surviving base rows NULL-fill
    * the new columns. UNTOUCHED partitions keep their old files (and
    * old schema) byte-identical — readers see the union schema via
    * `mergeSchema` and the old partitions' rows NULL-backfill, exactly
    * the q120 read contract. The batch must carry every base column
    * (it is an upsert); additions are the delta.
    *
    * Returns the touched partition values.
    */
  def mergeCowEvolve(spark: SparkSession, basePath: String,
      batch: DataFrame, keyCol: String, partCol: String): Seq[Any] = {
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // mergeSchema: a SECOND evolution must see the first one's column in
    // the base schema even when the touched partitions' files predate it
    // — otherwise survivors in touched partitions silently lose that
    // column and the base-column require validates against an incomplete
    // schema (round-14 advice; CowSpec pins the double-evolve)
    val base = spark.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col(partCol).isin(touched: _*))
    val baseCols = base.columns.toSeq
    require(baseCols.forall(batch.columns.contains),
      s"evolving batch must carry every base column; missing " +
        s"${baseCols.filterNot(batch.columns.contains).mkString(",")}")
    val allCols = baseCols ++
      batch.columns.filterNot(baseCols.contains).toSeq
    val survivors = base.join(
      batch.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val merged = batch.select(allCols.map(col): _*)
      .unionByName(survivors, allowMissingColumns = true)
      .select(allCols.map(col): _*)
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(basePath)
    touched
  }

  /** ANSI-MERGE conditional upsert (round 14) — the WHEN MATCHED clause
    * family [[mergeCow]] (unconditional replace) and [[applyChangelog]]
    * (op-column changelog) don't express:
    *
    * {{{ MERGE INTO base USING batch ON key
    *     WHEN MATCHED AND deleteWhen(t, s) THEN DELETE
    *     WHEN MATCHED AND updateWhen(t, s) THEN UPDATE SET *
    *     WHEN NOT MATCHED THEN INSERT * }}}
    *
    * `t`/`s` arrive as struct columns of the target and source row, so
    * conditions can compare BOTH sides (the idempotent-ingest staple
    * `s.ts > t.ts`, the tombstone staple `s.op = 'D'`). A matched pair
    * passing neither condition keeps the TARGET row unchanged — the
    * semantics an unconditional upsert cannot give.
    *
    * Same scale shape as [[mergeCow]]: touched-partition list from the
    * batch, pruned base read, ONE full-outer key join bounded by the
    * touched partitions, dynamic-overwrite land; a partition fully
    * emptied by deletes has its directory removed explicitly (escaped,
    * loud — the [[applyChangelog]] discipline). Returns the touched
    * partition values.
    */
  def mergeCowWhen(spark: SparkSession, basePath: String,
      batch: DataFrame, keyCol: String, partCol: String,
      updateWhen: (Column, Column) => Column,
      deleteWhen: (Column, Column) => Column = (_, _) => lit(false))
      : Seq[Any] = {
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return Nil
    // mergeSchema: see mergeCow — keeps evolved columns visible
    val base = spark.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col(partCol).isin(touched: _*))
    val dataCols = base.columns.toSeq
    require(dataCols.forall(batch.columns.contains),
      s"merge batch must carry every base column; missing " +
        s"${dataCols.filterNot(batch.columns.contains).mkString(",")}")
    val t = base.select(col(keyCol).as("__mk"),
      struct(dataCols.map(col): _*).as("t"))
    val s = batch.select(col(keyCol).as("__mk"),
      struct(dataCols.map(col): _*).as("s"))
    val joined = t.join(s, Seq("__mk"), "full_outer")
    val tc = col("t"); val sc = col("s")
    val keep = joined
      // NOT MATCHED source → insert; unmatched target → survivor;
      // matched → delete / conditional update / unchanged target
      .withColumn("__out",
        when(tc.isNull, sc)
          .when(sc.isNull, tc)
          .when(deleteWhen(tc, sc), lit(null))
          .when(updateWhen(tc, sc), sc)
          .otherwise(tc))
      .filter(col("__out").isNotNull)
      .select(dataCols.map(c => col(s"__out.$c").as(c)): _*)
      .localCheckpoint()
    val stillThere = keep.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    keep.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(basePath)
    touched.filterNot(stillThere).foreach { v =>
      val esc = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(String.valueOf(v))
      val dir = new org.apache.hadoop.fs.Path(s"$basePath/$partCol=$esc")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.delete(dir, true))
        throw new IllegalStateException(
          s"mergeCowWhen: emptied partition dir $dir was not deleted")
    }
    touched
  }

  /** Mixed CDC changelog apply — the Debezium-shaped batch the separate
    * merge/delete ops don't compose into: ONE batch carries inserts,
    * updates, AND deletes (`opCol` ∈ I/U/D) with a per-key sequence
    * (`seqCol`), applied last-writer-wins per key in ONE partition-pruned
    * pass. An I or U whose key exists replaces it (the standard CDC
    * reconcile), a D removes it, and only the key's NEWEST op counts —
    * an I+U+D on the same key in one batch nets to the delete.
    *
    * Scale shape (everything bounded by the batch, never the table):
    *  - last-writer-wins is one window over the changelog, partitioned
    *    by key (batch-sized shuffle);
    *  - upsert-touched partitions come from the batch rows; delete-
    *    touched partitions from ONE semi join of base against the
    *    delete keys (the same prune [[deleteCow]] pays — a D row needs
    *    no partition value, its location is discovered);
    *  - the rewrite reads ONLY the touched partitions, anti-joins ALL
    *    finalized keys once, unions the surviving upserts, and lands via
    *    dynamic partition overwrite;
    *  - a partition fully emptied by deletes never reaches the staged
    *    swap — its directory is removed explicitly (escaped path, the
    *    [[deleteCow]] pitfall).
    *
    * Same batch contract as [[mergeCow]]: a key's partition never
    * changes between base and batch. Returns the touched partitions.
    */
  def applyChangelog(spark: SparkSession, basePath: String,
      changelog: DataFrame, keyCol: String, partCol: String,
      opCol: String = "op", seqCol: String = "seq"): Seq[Any] = {
    require(!changelog.columns.contains("__cl_rn"),
      "changelog carries the reserved temp column __cl_rn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).desc)
    // localCheckpoint: the finalized batch feeds three consumers (touched
    // lists, anti-join keys, upsert rows) — materialize it once
    val last = changelog
      .withColumn("__cl_rn", row_number().over(w))
      .filter(col("__cl_rn") === 1).drop("__cl_rn")
      .localCheckpoint()
    // mergeSchema: see mergeCow — keeps evolved columns visible
    val base = spark.read.option("mergeSchema", "true").parquet(basePath)
    val dataCols = base.columns.toSeq
    val upserts = last.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    val delKeys = last.filter(col(opCol) === "D")
      .select(col(keyCol)).distinct()
    val touched = upserts.select(col(partCol))
      .unionByName(base.join(delKeys, Seq(keyCol), "left_semi")
        .select(col(partCol)))
      .distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return Nil
    val survivors = base.filter(col(partCol).isin(touched: _*))
      .join(last.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val merged = upserts
      .unionByName(survivors.select(dataCols.map(col): _*))
      .localCheckpoint()
    val stillThere = merged.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(basePath)
    // an upsert-touched partition always has output rows (the upserts
    // themselves), so a missing one here was emptied purely by deletes —
    // it existed in base and its directory must go (escaped, loud)
    touched.filterNot(stillThere).foreach { v =>
      val esc = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(String.valueOf(v))
      val dir = new org.apache.hadoop.fs.Path(s"$basePath/$partCol=$esc")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.delete(dir, true))
        throw new IllegalStateException(
          s"applyChangelog: emptied partition dir $dir was not deleted")
    }
    touched
  }

  /** Copy-on-write DELETE — the GDPR/right-to-be-forgotten job: remove
    * every row whose `keyCol` appears in `keys`, rewriting only the
    * partitions that actually hold such rows. Touched list = one
    * semi-join + distinct (when the key correlates with the partition
    * column that prunes hard; a user-scoped delete over a date layout
    * legitimately touches every partition — the cost every lakehouse
    * pays for that access pattern).
    *
    * The dynamic-overwrite pitfall is handled explicitly: a partition
    * whose rows are ALL deleted produces no output rows, so the
    * staged-swap write would silently leave its old files in place —
    * those directories are removed directly (CowSpec pins the case).
    *
    * Returns the touched partition values.
    */
  def deleteCow(spark: SparkSession, basePath: String, keys: DataFrame,
      keyCol: String, partCol: String): Seq[Any] = {
    // mergeSchema: see mergeCow — survivors keep evolved columns
    // (NULL-backfilled where their files predate the evolution)
    val base = spark.read.option("mergeSchema", "true").parquet(basePath)
    val k = keys.select(col(keyCol)).distinct()
    val touched = base.join(k, Seq(keyCol), "left_semi")
      .select(col(partCol)).distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return Nil
    val survivors = base.filter(col(partCol).isin(touched: _*))
      .join(k, Seq(keyCol), "left_anti")
      .localCheckpoint()
    val stillThere = survivors.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(basePath)
    // fully-emptied partitions never reach the dynamic overwrite —
    // drop their directories outright. The directory name uses Spark's
    // own partition-path escaping (a raw string interpolation would
    // miss 'a:b' → 'a%3Ab' — spaces pass through unescaped, but colons,
    // equals, percent and friends do not — and silently leave the
    // files, resurrecting every "deleted" row); a missing directory is
    // a loud error, since
    // the touched list came from data that was just read.
    touched.filterNot(stillThere).foreach { v =>
      val esc = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(String.valueOf(v))
      val dir = new org.apache.hadoop.fs.Path(s"$basePath/$partCol=$esc")
      val fs = dir.getFileSystem(
        spark.sessionState.newHadoopConf())
      if (!fs.delete(dir, true))
        throw new IllegalStateException(
          s"deleteCow: emptied partition dir $dir was not deleted")
    }
    touched
  }
}
