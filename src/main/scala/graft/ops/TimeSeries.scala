package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse time-series operators (the q104/q107/q108 faces as library
  * functions, shared by SparkEntry and the WarehouseScale harness).
  *
  * Scale shapes:
  *  - [[latestSnapshot]]: rank-1 window → Spark 4 plants a PARTIAL
  *    WindowGroupLimit below the shuffle (each map task forwards one
  *    candidate row per key) — the CDC merge-on-read path;
  *  - [[gapfillHourly]]: each key explodes only its OWN [min, max] hour
  *    span (no global calendar cartesian);
  *  - [[movingAvg]]: a RANGE frame over event-time seconds, tie-stable
  *    because simultaneous events share a frame.
  */
object TimeSeries {

  /** Newest row per key from an append-only log — the upsert view.
    * Deterministic under same-timestamp ties via the (ts, tieCol) DESC
    * order. Emits (key, last_ts [formatted string — the cross-engine
    * parquet-timestamp discipline], last_<tieCol>, payload columns
    * renamed last_*).
    */
  def latestSnapshot(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payload: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(keyCol) +:
        date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss").as("last_ts") +:
        col(tieCol).as(s"last_$tieCol") +:
        payload.map(c => col(c).as(s"last_$c")): _*)
  }

  /** Per-(key, hour) counts and value sums densified over each key's own
    * [min, max] hour span; missing hours become explicit zero rows.
    */
  def gapfillHourly(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val ev = df.select(col(keyCol), date_trunc("hour", col(tsCol))
      .as("hr"), col(valueCol).as("v"))
    val counts = ev.groupBy(col(keyCol), col("hr"))
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 6).as("sum_value"))
    val dense = ev.groupBy(col(keyCol))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hr"))
    dense.join(counts, Seq(keyCol, "hr"), "left")
      .select(col(keyCol),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** Trailing RANGE-frame mean of `valueCol` over the preceding
    * `frameSeconds` of each key's own timeline (frame inclusive of the
    * current instant). Emits (key, idCol, ts_s, n_frame, avg_1h).
    */
  def movingAvg(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, valueCol: String,
      frameSeconds: Long = 3600L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-frameSeconds, 0L)
    df.select(col(keyCol), col(idCol),
      date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
      count(lit(1)).over(w).as("n_frame"),
      round(avg(col(valueCol)).over(w), 6).as("avg_1h"))
  }

  /** CDC changelog EXTRACTION — q139's inverse, the change-data-feed
    * export every lakehouse offers: given two snapshots of a keyed
    * table, emit the MINIMAL I/U/D changelog that turns v0 into v1
    * (I = key only in v1, D = key only in v0, U = key in both with any
    * payload column differing — null-safe compare, so NULL→value and
    * value→NULL both register). One full-outer key join, nothing else;
    * at 100 TB both sides shuffle once on the key (or co-locate via
    * bucketing) and unchanged rows — the overwhelming majority of a
    * real feed — are filtered before anything downstream sees them.
    * D rows carry the key with NULL payload (the q139 shape, so
    * extract ∘ apply round-trips — TimeSeriesSpec pins
    * `applyChangelog(v0, cdcExtract(v0, v1)) == v1`).
    */
  def cdcExtract(v0: DataFrame, v1: DataFrame, keyCol: String,
      payload: Seq[String]): DataFrame = {
    val a = payload.foldLeft(v0.select(col(keyCol) +: payload.map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"__a_$c") }
      .withColumn("__in_a", lit(true))
    val b = v1.select(col(keyCol) +: payload.map(col): _*)
      .withColumn("__in_b", lit(true))
    val changed = payload.map(c => !(col(s"__a_$c") <=> col(c)))
      .reduce(_ || _)
    a.join(b, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__in_a").isNull, lit("I"))
          .when(col("__in_b").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(col("op") +: col(keyCol) +:
        payload.map(c => when(col("op") =!= "D", col(c)).as(c)): _*)
  }
}
