package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

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

  /** Interval (point-in-range) join: every `points` row paired with
    * every `intervals` row whose closed `[startCol, endCol]` contains
    * its `pointTs` — "which sessions / maintenance windows / validity
    * ranges cover this event". Spark plans a raw
    * `p.ts BETWEEN i.s AND i.e` join as a nested-loop cartesian; this
    * is the bucketed form that never explodes:
    *
    * each point maps to ONE `bucketSeconds` time bin; each interval
    * replicates to the bins it covers (length/bucket + 1 rows — pick
    * the bucket near the median interval length to keep replication
    * O(1)); the join is EQUI on the bin, co-locating by time, and the
    * exact range predicate runs as a residual filter inside the joined
    * partition. A (point, interval) pair meets in exactly the point's
    * own bin, so no dedup pass is needed. Cost: one shuffle each side
    * on the bin key; skew follows the event-time distribution (a hot
    * bin wants a smaller bucket, or salting — the [[Skew]] treatment).
    *
    * Output: all point columns + all interval columns (caller renames
    * collisions beforehand); inner-join semantics (uncovered points
    * drop).
    */
  def intervalJoin(points: DataFrame, pointTs: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   bucketSeconds: Long = 3600L): DataFrame = {
    val pb = points.withColumn("__b",
      floor(epochSeconds(points, pointTs) / bucketSeconds).cast("long"))
    // least/greatest: a malformed (end < start) interval must not feed
    // sequence() a reversed range — Spark would silently auto-step -1 and
    // replicate the row anyway. The exact residual below already rejects
    // its matches (no ts satisfies start ≤ ts ≤ end when start > end), so
    // the guard only keeps the replication bounded, never changes output.
    val ib = intervals.withColumn("__b",
      explode(sequence(
        least(
          floor(epochSeconds(intervals, startCol) / bucketSeconds),
          floor(epochSeconds(intervals, endCol) / bucketSeconds))
          .cast("long"),
        greatest(
          floor(epochSeconds(intervals, startCol) / bucketSeconds),
          floor(epochSeconds(intervals, endCol) / bucketSeconds))
          .cast("long"))))
    pb.join(ib, "__b")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__b")
  }

  /** Interval-overlap join: every (left, right) row pair whose closed
    * intervals `[lStart, lEnd]` and `[rStart, rEnd]` intersect
    * (`lStart ≤ rEnd AND rStart ≤ lEnd`) — "which sessions ran during
    * this outage", "which validity ranges coexist". The two-sided
    * sibling of [[intervalJoin]]: Spark would plan the raw predicate as
    * a nested-loop cartesian; this is the bucketed equi form.
    *
    * BOTH sides replicate to the `bucketSeconds` bins they cover, the
    * join is EQUI on the bin, and the exact predicate runs as a
    * residual. Unlike the point case, an overlapping pair meets in
    * EVERY bin the two intervals share — so a second residual keeps the
    * pair only in the FIRST shared bin, `bin = max(firstBin(l),
    * firstBin(r))`: each pair emits exactly once with NO distinct pass
    * (a distinct would re-shuffle the whole join output; the residual
    * is free). Cost: one shuffle per side on the bin key; replication
    * is interval-length/bucket + 1 rows, so pick the bucket near the
    * median interval length.
    *
    * Output: all left columns + all right columns (caller renames
    * collisions beforehand); inner-join semantics.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  bucketSeconds: Long = 3600L): DataFrame = {
    // least/greatest on the bin range + explicit well-formedness residuals:
    // without them a malformed (end < start) interval would make
    // sequence() silently generate a DESCENDING range — the row still
    // replicates — and the overlap predicate alone does not imply
    // well-formedness, so such a row could emit pairs. A reversed interval
    // is empty: it matches nothing (round-8 advice).
    val lb = left
      .withColumn("__b0l",
        floor(epochSeconds(left, lStart) / bucketSeconds).cast("long"))
      .withColumn("__bel",
        floor(epochSeconds(left, lEnd) / bucketSeconds).cast("long"))
      .withColumn("__b", explode(sequence(
        least(col("__b0l"), col("__bel")),
        greatest(col("__b0l"), col("__bel")))))
    val rb = right
      .withColumn("__b0r",
        floor(epochSeconds(right, rStart) / bucketSeconds).cast("long"))
      .withColumn("__ber",
        floor(epochSeconds(right, rEnd) / bucketSeconds).cast("long"))
      .withColumn("__b", explode(sequence(
        least(col("__b0r"), col("__ber")),
        greatest(col("__b0r"), col("__ber")))))
    lb.join(rb, "__b")
      .filter(col("__b") === greatest(col("__b0l"), col("__b0r")))
      .filter(col(lStart) <= col(lEnd) && col(rStart) <= col(rEnd))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__b", "__b0l", "__bel", "__b0r", "__ber")
  }

  /** Epoch seconds of a time-like column, whatever dtype the scan shipped.
    * Spark refuses `CAST(TIMESTAMP_NTZ AS DOUBLE)` outright
    * (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION), so temporal types route
    * through TIMESTAMP first — exact under the engine's pinned UTC session
    * timezone, where the NTZ wall clock IS the instant. Numerics (the
    * reference's abstract integer periods) pass straight through.
    */
  private[graft] def epochSeconds(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampNTZType | TimestampType | DateType =>
        col(c).cast(TimestampType).cast("double")
      case _ => col(c).cast("double")
    }
}
