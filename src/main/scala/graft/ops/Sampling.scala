package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation (SURVEY §7.5
  * extension surface): data-mixing pipelines sample documents per
  * source ∝ quality/length; anything `rand()`-based is neither
  * reproducible across runs nor joinable across engines, so every coin
  * here is the repo's md5 ppm idiom ([[graft.ext.Splits.ppmCoin]]).
  */
object Sampling {

  /** Weighted sampling WITHOUT replacement, top `k` per group —
    * Efraimidis & Spirakis 2006 (A-ES), hash-derandomized: each row
    * draws u ∈ (0,1) from its id's md5 coin and ranks by the exponential
    * key `-ln(u)/w` ascending (equivalent to the paper's u^(1/w)
    * descending, better conditioned for large weights); the k smallest
    * keys per group are EXACTLY a weighted sample without replacement.
    * Same row set in any engine, any run, any partitioning.
    *
    * Scale shape: one codegen projection for the key (md5 + ln — no
    * shuffle, no state), one shuffle on `groupCol` for the per-group
    * top-k `row_number` window. Groups are sources/languages — many and
    * bounded — so no single-task window; a giant group costs its sort,
    * the standard top-k-per-group price (q15 idiom). The key is rounded
    * at 6 decimals before ranking with an id tie-break, so the ranking
    * compares only values both engines agree on bit-for-bit.
    *
    * Output: every input column plus `wkey`, ≤ k rows per group.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String,
                             idCol: String, weightCol: String, k: Int,
                             seed: String = "wsample"): DataFrame = {
    val u = (graft.ext.Splits.ppmCoin(col(idCol), seed).cast("double") +
      0.5) / 1e6
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("wkey").asc, col(idCol).asc)
    df.withColumn("wkey",
        round(-log(u) / col(weightCol).cast("double"), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
