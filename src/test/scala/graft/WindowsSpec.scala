package graft

import org.apache.spark.sql.functions._
import graft.ops.Windows

/** W1 sliding-window pinning tests (SURVEY §5: half-open bounds, dropped
  * final partial window, multi-membership) against the reference's
  * `range(ts_min, ts_max - w, w/2)` enumeration (`AA-AR.py:102-104`).
  */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesAt(ts: Seq[Long]) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, i.toLong + 100, 1L, t) }
      .toDF("src", "dst", "weight", "ts")

  /** reference window enumeration: k with start ts_min + k*stride,
    * starts strictly below ts_max - w.
    */
  private def refWids(tsMin: Long, tsMax: Long, w: Int, stride: Int,
                      t: Long): Seq[Long] =
    Iterator.from(0).map(k => (k.toLong, tsMin + k * stride))
      .takeWhile { case (_, s) => s < tsMax - w }
      .collect { case (k, s) if t >= s && t < s + w => k }
      .toSeq

  test("window ids match the reference enumeration on a dense range") {
    val ts = (0L to 40L) ++ Seq(7L, 7L, 13L, 14L, 35L)
    val df = edgesAt(ts)
    val got = Windows.withWindowId(df, 14, 7)
      .select($"ts", $"wid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    val tsMin = ts.min
    val tsMax = ts.max
    for (t <- ts.distinct) {
      val want = refWids(tsMin, tsMax, 14, 7, t)
      assert(got.getOrElse(t, Seq.empty) == want,
        s"ts=$t want=$want got=${got.getOrElse(t, Seq.empty)}")
    }
  }

  test("edges near ts_max fall out of the dropped final partial window") {
    // ts_min=0, ts_max=20, w=14, stride=7 → starts: 0 only (7 >= 20-14=6)
    val df = edgesAt(Seq(0L, 5L, 13L, 14L, 19L, 20L))
    val got = Windows.withWindowId(df, 14, 7)
      .select($"ts", $"wid").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L), (5L, 0L), (13L, 0L)))
  }

  test("overlapping windows replicate an edge into both") {
    // ts_min=0, ts_max=30 → starts 0,7,14 (21 >= 30-14=16 stops at 14+)
    // wait: range(0, 16, 7) = 0, 7, 14 → 3 windows
    val df = edgesAt(Seq(0L, 10L, 30L))
    val got = Windows.withWindowId(df, 14, 7)
      .select($"ts", $"wid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(10L) == Seq(0L, 1L)) // [0,14) and [7,21)
    assert(!got.contains(30L))      // beyond last window end (14+14=28)
  }

  test("w_start column is ts_min + wid*stride") {
    val df = edgesAt(Seq(3L, 10L, 24L, 40L))
    val rows = Windows.withWindowId(df, 14, 7)
      .select($"wid", $"w_start").distinct().as[(Long, Long)].collect()
    rows.foreach { case (wid, ws) => assert(ws == 3L + wid * 7) }
  }
}
