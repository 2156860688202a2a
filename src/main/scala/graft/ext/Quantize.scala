package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (int8-range) quantization of embedding columns — the storage
  * form a 100 TB vector corpus actually ships: 64 float32 dims (256 B)
  * become 64 uint8 codes (64 B) plus one shared per-dimension (min, max)
  * table, a 4× footprint cut that turns ANN candidate scans
  * memory-bandwidth-bound instead of capacity-bound. Coarser than PQ
  * (`SimSearch.ivfPq`) but codebook-free: encode/decode is pure
  * per-element arithmetic, no nearest-centroid search, so encoding is a
  * map-only projection that never shuffles.
  *
  * Range fit is one aggregation pass: `posexplode` to (dim, value) then
  * min/max per dim — partial aggregation reduces each task's explosion to
  * `dim` rows before the (tiny, `dim`-key) shuffle, so the pass scans once
  * and exchanges kilobytes regardless of corpus size. The fitted ranges
  * are plan literals thereafter (the q40/q50 trained-quantizer
  * convention), making codes bit-reproducible in any engine: bin
  * `floor((x−min)/(max−min)·256)` clamped to [0, 255] — floor, not
  * round, because IEEE floor agrees across engines while round-half rules
  * differ.
  */
object Quantize {

  /** Per-dimension [min, max] over `vecCol`, as two driver arrays.
    * One distributed pass; dims are 1-hop aggregation keys.
    */
  def fitRanges(emb: DataFrame, vecCol: String = "embedding")
      : (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("pos"))
      .collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Encode `vecCol` against fitted ranges: adds `codes` (array<int>,
    * each in [0, 255]) and `code_sum` (bigint — an integer-exact
    * checksum/sanity aggregate, order-independent unlike any float
    * reduction). A degenerate dimension (max == min) encodes as 0.
    */
  def encode(emb: DataFrame, mins: Array[Double], maxs: Array[Double],
             vecCol: String = "embedding"): DataFrame = {
    val mnA = typedLit(mins)
    val mxA = typedLit(maxs)
    val codes = transform(col(vecCol).cast("array<double>"),
      (x: Column, i: Column) => {
        val mn = element_at(mnA, i + 1)
        val mx = element_at(mxA, i + 1)
        when(mx === mn, lit(0L)).otherwise(
          least(lit(255L), greatest(lit(0L),
            floor((x - mn) / (mx - mn) * lit(256.0)))))
          .cast("int")
      })
    emb.withColumn("codes", codes)
      .withColumn("code_sum",
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c))
  }
}
