package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark's DataFrame API lacks as primitives,
  * composed Spark-first from the operators it has (north-star extension
  * surface — the "custom operator" family of SURVEY §7.5).
  */
object Relational {

  /** Backward as-of join: for every left row, attach the LATEST right
    * row of the same `key` whose `rightTs` is ≤ `leftTs` (`strict =
    * true` → strictly <, which also makes self as-of meaningful: "the
    * previous row of this key", without matching yourself). The
    * time-series primitive behind "state at event time" joins — quotes
    * as of a trade, config as of a request, previous order of a
    * customer.
    *
    * Distributed shape — this is NOT a range join (no n×m candidate
    * explosion) and NOT a per-left-row lookup: both sides are tagged
    * and unioned, shuffled ONCE on `key`, and a single ascending
    * `(ts, side)` sort-window per key carries the latest right payload
    * forward into each left row (`last(..., ignoreNulls)` over an
    * unbounded-preceding frame — Spark's running-state idiom). Cost is
    * exactly a sort-merge join's shuffle+sort on the key, linear in
    * rows after; it survives a 100× scale-up as long as single keys
    * fit a partition (a hot key wants time-bucket salting with
    * boundary replication — the [[Skew]] treatment — before this
    * operator, same as it would for any join).
    *
    * Right rows sharing an exact `(key, rightTs)` collapse first to
    * the one with the greatest `tieBreak` (as-of resolves at timestamp
    * resolution; the winner is deterministic in any engine). Left
    * columns pass through unchanged; the match arrives as
    * `asof_<rightTs>` plus `asof_<payload>` columns, null when no
    * right row precedes.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String], tieBreak: String,
               strict: Boolean = false): DataFrame = {
    val pStruct = struct((tieBreak +: payload).map(col): _*)
    val r2 = right.groupBy(col(key), col(rightTs))
      .agg(max(pStruct).as("__p"))
      .select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(col(rightTs).as("asof_ts"), col("__p").as("p")).as("__m"))
    val l2 = left.select(col(key), col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(r2.schema("__m").dataType).as("__m"),
      struct(left.columns.map(col): _*).as("__l"))
    val u = r2.withColumn("__l",
        lit(null).cast(l2.schema("__l").dataType))
      .unionByName(l2)
    // equal-ts ordering decides the boundary: inclusive puts the right
    // row BEFORE the left row in the frame (side 0 first), strict puts
    // it after (invisible to the unbounded-preceding frame)
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        (col("__match.asof_ts").as(s"asof_$rightTs") +:
          payload.map(c => col(s"__match.p.$c").as(s"asof_$c"))): _*)
  }
}
