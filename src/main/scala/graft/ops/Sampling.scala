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

  /** Materialize one training epoch from the data-mixing weights — the
    * execution step AFTER [[graft.ext.TextOps.sourceMixWeights]] decides
    * the per-source multipliers: each document of a source with mix
    * weight w appears ⌊w⌋ times plus one more with probability w − ⌊w⌋
    * (the standard fractional-epoch upsampling of mixture training), so
    * the expected token mass per source lands exactly on w × tokens(src).
    * Every coin is the md5 ppm idiom on the doc id, so the SAME manifest
    * materializes in any engine, any run, any partitioning.
    *
    * Each emitted copy also carries `ord` — md5(doc_id | copy | seed) —
    * a deterministic global shuffle key: sorting by it IS the epoch's
    * training order (engine-independent, and at scale a range-partitioned
    * sort on a uniform hex key is perfectly balanced by construction).
    *
    * Scale shape: the weight table is one row per source (≪ docs), so the
    * join is a broadcast and the whole materialization is MAP-ONLY — no
    * shuffle touches the corpus; a 100 TB epoch manifest streams straight
    * from the scan to the sink. The fractional weight routes through ppm
    * integers (w·10⁶ rounded once) so the ⌊w⌋/frac split never compares
    * raw doubles across engines.
    *
    * Input: (idCol, `source`, `n_tokens`) rows. Output: idCol, source,
    * n_tokens, copy ∈ [0, copies), ord.
    */
  def mixtureEpoch(docSource: DataFrame, cap: Double = 5.0,
                   idCol: String = "doc_id",
                   seed: String = "mixepoch"): DataFrame = {
    val wPpm = graft.ext.TextOps.sourceMixWeights(docSource, cap)
      .select(col("source"),
        round(col("mix_weight") * 1e6, 0).cast("bigint").as("w_ppm"))
    val coin = graft.ext.Splits.ppmCoin(col(idCol), seed)
    docSource.join(broadcast(wPpm), "source")
      .withColumn("copies",
        expr("w_ppm div 1000000") +
          when(coin < col("w_ppm") % 1000000L, 1L).otherwise(0L))
      .filter(col("copies") > 0)
      .select(col(idCol), col("source"), col("n_tokens"),
        explode(sequence(lit(0L), col("copies") - 1)).as("copy"))
      .withColumn("ord",
        md5(concat_ws("|", col(idCol), col("copy"), lit(seed + "-ord"))))
  }
}
