package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles the join case at
  * runtime (ScaleTechniquesSpec pins OptimizeSkewedJoin actually firing
  * on a planted hub); for AGGREGATIONS the honest scope note: Spark's
  * hash aggregate already does map-side partial aggregation, so for
  * algebraic aggs (sum/count/min/max) a hub key reaches its reducer as
  * ≤ #map-tasks partial rows and salting is belt-and-braces. The salted
  * two-phase shape below is the one that MATTERS when partial
  * aggregation is unavailable — a non-combinable aggregate buffer
  * (collect_list/exact-median-style), an RDD-path reduce, or a first
  * shuffle reused by a downstream per-(key,salt) stage — and q140 keeps
  * the shape hash-green so it is a verified building block, not a
  * sketch: one shuffle sees (key, salt) so no single task owns a hub,
  * the second merges `salts` exact partials per key.
  */
object Skew {

  /** Two-phase salted sum-aggregation: equivalent to
    * `df.groupBy(keys).agg(sum(valueCol))` for ANY key distribution, but
    * the first exchange distributes each key over `salts` partitions.
    * Sums are associative so partials merge exactly; the same shape works
    * for count/min/max (any commutative monoid).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16, as: String = "sum"): DataFrame = {
    val k = keys.map(col)
    val partial = df
      .withColumn("__salt", pmod(spark_partition_id() +
        xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(k :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"))
    partial.groupBy(k: _*).agg(sum(col("__partial")).as(as))
  }

  /** Salted sum + count per key in ONE two-phase pass (one scan, two
    * exchanges) — the shape q140 demonstrates: the hub key's rows are
    * spread over `salts` first-phase reducers, so no single task owns
    * the hub; the second exchange merges ≤ `salts` exact partial rows
    * per key. Integer-typed `valueCol` keeps the merge bit-exact.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16, sumAs: String = "sum",
                     cntAs: String = "cnt"): DataFrame = {
    val k = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() +
        xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(k :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(k: _*)
      .agg(sum(col("__psum")).as(sumAs), sum(col("__pcnt")).as(cntAs))
  }

  /** Salted count per key — same two-phase shape. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16,
                  as: String = "cnt"): DataFrame = {
    val k = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() +
        xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(k :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(k: _*).agg(sum(col("__partial")).as(as))
  }

  /** Salted broadcast-side replication join for a skewed LEFT key space:
    * explode the (small) right side `salts` times so the left's salted
    * keys all find their match, then join on (key, salt). Use when AQE
    * skew-join isn't available (e.g. inside a cached subtree) and the
    * right side is small enough to replicate but too big to broadcast
    * whole. Returns the same rows as `left.join(right, keys)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + xxhash64(monotonically_increasing_id()),
        lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
