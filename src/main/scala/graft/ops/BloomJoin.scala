package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the runtime-filter shape that makes a
  * selective dim × huge fact semi join cheap at 100 TB: the dim keys are
  * summarized ONCE into a broadcast Bloom filter, the fact side is
  * screened MAP-ONLY (zero shuffle) before the exact semi join, so the
  * join's shuffle sees only the survivors (true matches + ≤ fpp false
  * positives) instead of the full fact table. The exact left-semi join
  * afterwards removes the false positives — the result is EXACTLY the
  * semi join, the bloom is purely a pre-shuffle row reducer (Spark's own
  * `runtime.bloomFilter` injects the same shape; here it is explicit,
  * engine-portable, and hash-checkable).
  *
  * The filter reuses the portable arithmetic of
  * [[graft.ext.Dedup.bloomIncrementalDedup]] (q84): h1/h2 are the 28-bit
  * md5-hex halves of the key rendered as a string, position i is
  * Kirsch–Mitzenmacher (h1 + i·h2) mod m, the filter is bit_or-aggregated
  * 32-bit word masks, and the probe chains k broadcast lookups of the
  * word table. One-sided the right way around for a semi join: a true
  * match is NEVER dropped (identical key → identical positions, all
  * set); a non-match survives the screen with probability ≤ fpp and dies
  * in the exact join.
  *
  * Reference context: the reference has no join optimizer; this belongs
  * to the warehouse extension surface (SURVEY §2.12).
  */
object BloomJoin {

  /** The map-only Bloom screen alone (true matches plus ≤ fpp false
    * positives) — exposed so callers/specs can observe the row reduction
    * the screen buys before the exact join.
    */
  def bloomScreen(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.001): DataFrame = {
    // the screen stitches __gbj_-prefixed temp columns onto the caller's
    // fact frame — fail fast rather than silently corrupt the probe if
    // the input already carries one
    val clash = (fact.columns ++ dim.columns).filter(_.startsWith("__gbj_"))
    require(clash.isEmpty,
      s"input carries reserved __gbj_ columns: ${clash.mkString(",")}")
    val dimKeys = dim.select(col(dimKey)).distinct()
      .filter(col(dimKey).isNotNull)
    val (m, k) = graft.ext.Dedup.bloomParams(dimKeys.count(), fpp)
    // ONE native md5 per row (the q84 Md5HalvesExpr idiom), h1/h2 as
    // materialized columns — every per-function position is then plain
    // integer arithmetic. The first draft recomputed the full
    // hex-substring md5 for every one of the k probes' word AND mask
    // sides (~6k digests/row); at 50M fact rows that was the whole cost
    // of the operator (WarehouseScale: 486 s → the md5 was the join).
    def packedHalves(c: Column): Column =
      org.apache.spark.sql.graft.GraftExprBridge.md5Halves(c.cast("string"))
    def withHalves(df: DataFrame, c: Column): DataFrame = {
      val p = packedHalves(c)
      df.withColumn("__gbj_h1", shiftrightunsigned(p, 28))
        .withColumn("__gbj_h2", p.bitwiseAND(lit((1L << 28) - 1)))
    }
    def pos(i: Int): Column =
      pmod(col("__gbj_h1") + lit(i.toLong) * col("__gbj_h2"), lit(m))
    // native shifts, not the pow(2,·)/divide arithmetic q84 uses — that
    // form exists for DuckDB-mirror parity, which this operator doesn't
    // need (the oracle checks the exact semi join, not the screen)
    def wordOf(p: Column): Column = shiftrightunsigned(p, 5)
    def maskOf(p: Column): Column =
      org.apache.spark.sql.graft.GraftExprBridge.shiftLeftVar(
        lit(1L), pmod(p, lit(32L)).cast("int"))
    val words = withHalves(dimKeys, col(dimKey))
      .select(explode(array((0 until k).map(pos): _*)).as("p"))
      .groupBy(wordOf(col("p")).as("w"))
      .agg(bit_or(maskOf(col("p"))).as("bits"))
    val bw = broadcast(words)
    var cur = withHalves(fact, col(factKey))
    val seen = (0 until k).map { i =>
      val p = pos(i)
      cur = cur.join(
        bw.select(col("w").as(s"__gbj_w$i"), col("bits").as(s"__gbj_bits$i")),
        wordOf(p) === col(s"__gbj_w$i"), "left")
      coalesce(col(s"__gbj_bits$i"), lit(0L))
        .bitwiseAND(maskOf(p)) =!= lit(0L)
    }.reduce(_ && _)
    cur.filter(coalesce(seen, lit(false)))
      .drop(Seq("__gbj_h1", "__gbj_h2") ++
        (0 until k).flatMap(i => Seq(s"__gbj_w$i", s"__gbj_bits$i")): _*)
  }

  /** Exact semi join of `fact` against `dim` keys, Bloom-prescreened. */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.001): DataFrame = {
    val screened = bloomScreen(fact, factKey, dim, dimKey, fpp)
    screened.join(
      dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_semi")
  }
}
