package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training-data pipelines.
  *
  * A train/val/test assignment must be (a) stable under reruns and
  * re-partitioning, (b) independent of cluster layout, and (c)
  * reproducible by any engine that needs to join against it (a labeling
  * job in one system, an eval harness in another). `rand()` satisfies
  * none of these; a hash coin on the id satisfies all three. The coin is
  * the repo's engine-portable md5 idiom (15-hex-digit prefix mod 10⁶ —
  * exactly mirrored by the q59 DuckDB oracle), the same recipe as
  * `AaAr.sketchProjection` and `SmurfGen.backgroundEdges`.
  */
object Splits {

  /** Ppm coin on the id: uniform in [0, 10⁶) per (id, seed). Evaluated
    * by the native single-digest expression
    * ([[org.apache.spark.sql.graft.Md5PpmExpr]]) — bit-identical to the
    * `conv(substring(md5(...), 1, 15), 16, 10) % 1000000` composition
    * every sampling oracle mirrors (NativeExprSpec pins the parity), at
    * one digest and two integer ops per row instead of the hex-string
    * round-trip.
    */
  def ppmCoin(id: Column, seed: String): Column =
    org.apache.spark.sql.graft.GraftExprBridge
      .md5Ppm(concat_ws("|", id, lit(seed)))

  /** Assign each row a split label by hash: coin < trainPpm → "train",
    * < valPpm → "val", else "test". Defaults: 90/5/5.
    */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                trainPpm: Long = 900000L, valPpm: Long = 950000L,
                seed: String = "split"): DataFrame = {
    val coin = ppmCoin(col(idCol), seed)
    df.select(col(idCol),
      when(coin < trainPpm, lit("train"))
        .when(coin < valPpm, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** LEAKAGE-FREE split (round 14): [[hashSplit]] with the coin drawn
    * on the near-dup CLUSTER id instead of the document id — every
    * member of a near-dup family shares one coin, so re-worded copies
    * of a validation document can never land in train (the
    * eval-contamination leak a per-doc hash split cannot prevent, and
    * the reason production pipelines split AFTER clustering). Docs
    * outside any cluster (the vast majority) coin on their own id,
    * which reduces to [[hashSplit]] for them bit-for-bit.
    *
    * `clusters` is the (doc_id, cluster_id) table of
    * [[graft.ext.Dedup.connectedComponents]] — members only; the left
    * join against it is one id-keyed shuffle (the cluster table ≪
    * corpus in any healthy pass) and everything else is map-only.
    */
  def clusterSplit(docs: DataFrame, clusters: DataFrame,
                   idCol: String = "doc_id", trainPpm: Long = 900000L,
                   valPpm: Long = 950000L,
                   seed: String = "split"): DataFrame = {
    val grouped = docs.select(col(idCol))
      .join(clusters.select(col(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col(idCol)))
    val coin = ppmCoin(col("group_id"), seed)
    grouped.select(col(idCol), col("group_id"),
      when(coin < trainPpm, lit("train"))
        .when(coin < valPpm, lit("val"))
        .otherwise(lit("test")).as("split"))
  }
}
