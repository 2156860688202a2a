package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding integer-time windows (SURVEY W1).
  *
  * The reference enumerates window starts
  * `range(ts_min, ts_max - w, w/2)` (`/root/reference/AA-AR.py:102-104`)
  * and runs one joblib task per window over the WHOLE edge frame — each
  * window re-scans all edges. Here each edge is assigned its (≤ w/stride)
  * window ids arithmetically and exploded: one scan of the edge table total,
  * and downstream per-window aggregation is an ordinary keyed shuffle that
  * parallelizes over (window × key) instead of one task per window. This is
  * the semantics of `window($"ts", w, stride)` generalized to abstract
  * integer timestamps.
  *
  * Faithful quirk (SURVEY §7.4): python `range`'s exclusive stop drops the
  * final (possibly partial) window — starts are strictly `< ts_max - w`.
  */
object Windows {

  /** Adds `wid` (window id, 0-based) to an edge table with integer `ts`.
    * Window `k` covers `[ts_min + k*stride, ts_min + k*stride + w)`.
    * Edges belonging to multiple overlapping windows are replicated
    * (standard sliding-window semantics). Edges after the last window's
    * end are dropped, matching the reference.
    *
    * ts_min/ts_max are a tiny global aggregate broadcast back via a cross
    * join — a 1-row build side, so Catalyst plans BroadcastNestedLoopJoin
    * with negligible cost at any scale.
    */
  def withWindowId(edges: DataFrame, w: Int, stride: Int): DataFrame = {
    val bounds = edges.agg(
      min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"))
    val nWin = greatest(
      lit(0L),
      ceil((col("ts_max") - col("ts_min") - lit(w)).cast("double") / stride)
        .cast("bigint"))
    edges.crossJoin(broadcast(bounds.select(col("ts_min"), nWin.as("n_win"))))
      .withColumn("k_min",
        greatest(lit(0L),
          floor((col("ts") - col("ts_min") - lit(w)).cast("double") / stride)
            .cast("bigint") + 1L))
      .withColumn("k_max",
        least(col("n_win") - 1L,
          floor((col("ts") - col("ts_min")).cast("double") / stride)
            .cast("bigint")))
      // guard BEFORE explode: Spark's sequence(a,b) with a>b is DESCENDING,
      // not empty — an unguarded explode would invent windows.
      .filter(col("k_min") <= col("k_max"))
      .withColumn("wid", explode(sequence(col("k_min"), col("k_max"))))
      .withColumn("w_start", col("ts_min") + col("wid") * stride)
      .drop("k_min", "k_max", "ts_min", "n_win")
  }

  /** DuckDB equivalent of withWindowId over an `edges` CTE, as a CTE named
    * `wedges`. Mirrors the Spark arithmetic exactly.
    */
  def sqlCte(w: Int, stride: Int): String =
    s"""bounds AS (
       |  SELECT min(ts) AS ts_min,
       |         greatest(0, CAST(ceil(CAST(max(ts) - min(ts) - $w AS DOUBLE) / $stride) AS BIGINT)) AS n_win
       |  FROM edges),
       |wedges AS (
       |  SELECT e.*, unnest(generate_series(k_min, k_max)) AS wid,
       |         b.ts_min
       |  FROM (SELECT e0.*,
       |          greatest(0, CAST(floor(CAST(e0.ts - b0.ts_min - $w AS DOUBLE) / $stride) AS BIGINT) + 1) AS k_min,
       |          least(b0.n_win - 1, CAST(floor(CAST(e0.ts - b0.ts_min AS DOUBLE) / $stride) AS BIGINT)) AS k_max
       |        FROM edges e0, bounds b0) e, bounds b
       |  WHERE k_min <= k_max)""".stripMargin
}
