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
    val dimKeys = dim.select(col(dimKey)).distinct()
      .filter(col(dimKey).isNotNull)
    val (m, k) = graft.ext.Dedup.bloomParams(dimKeys.count(), fpp)
    def h1(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 7), 16, 10).cast("long")
    def h2(c: Column): Column =
      conv(substring(md5(c.cast("string")), 8, 7), 16, 10).cast("long")
    def pos(c: Column, i: Int): Column =
      pmod(h1(c) + lit(i.toLong) * h2(c), lit(m))
    def wordOf(p: Column): Column =
      ((p - pmod(p, lit(32L))) / lit(32.0)).cast("long")
    def maskOf(p: Column): Column =
      pow(lit(2.0), pmod(p, lit(32L)).cast("double")).cast("long")
    val words = dimKeys
      .select(explode(array((0 until k).map(i =>
        pos(col(dimKey), i)): _*)).as("p"))
      .groupBy(wordOf(col("p")).as("w"))
      .agg(bit_or(maskOf(col("p"))).as("bits"))
    val bw = broadcast(words)
    var cur = fact
    val seen = (0 until k).map { i =>
      val p = pos(col(factKey), i)
      cur = cur.join(
        bw.select(col("w").as(s"__w$i"), col("bits").as(s"__bits$i")),
        wordOf(p) === col(s"__w$i"), "left")
      coalesce(col(s"__bits$i"), lit(0L))
        .bitwiseAND(maskOf(p)) =!= lit(0L)
    }.reduce(_ && _)
    cur.filter(coalesce(seen, lit(false)))
      .drop((0 until k).flatMap(i => Seq(s"__w$i", s"__bits$i")): _*)
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
