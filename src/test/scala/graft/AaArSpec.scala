package graft

import graft.algo.AaAr
import graft.ops.{Features, Windows}
import org.apache.spark.sql.functions._

/** §3.1 pipeline: focus scores, sketches, change scores on a deterministic
  * burst fixture (FIXTURES.md §1.1: one injected burst window must yield
  * the top change score).
  */
class AaArSpec extends SparkSpec {
  import spark.implicits._

  /** 40 timestamps of steady background traffic + a dense burst around a
    * hub account in window ~[24, 32).
    */
  private lazy val edges = {
    val rng = new scala.util.Random(5)
    val background = for {
      t <- 0L until 40L
      k <- 0 until 6
    } yield (rng.nextInt(10).toLong, 10L + rng.nextInt(10),
             1L + rng.nextInt(5), t)
    val burst = for {
      t <- 26L until 30L
      k <- 0 until 40
    } yield (99L, 10L + rng.nextInt(10).toLong, 50L + rng.nextInt(20), t)
    (background ++ burst).toDF("src", "dst", "weight", "ts")
  }

  test("pair enumeration covers the 66 strict upper-triangle pairs") {
    assert(AaAr.pairs.size == 66)
    assert(AaAr.pairs.map(_._1) == (0 until 66))
    AaAr.pairs.foreach { case (_, f1, f2) => assert(f1 < f2) }
  }

  test("focus scores exist only for non-zero feature pairs, in (0,1)") {
    val feats = Features.accountFeaturesByWindow(
      Windows.withWindowId(edges, 8, 4))
    val fs = AaAr.focusScores(feats, numTrees = 20)
    val rows = fs.select($"score").as[Double].collect()
    assert(rows.nonEmpty)
    rows.foreach(s => assert(s > 0.0 && s < 1.0))
  }

  test("end-to-end change scores: burst window scores highest") {
    val out = AaAr.run(edges, windowSize = 8, sketchNum = 32, backWs = 3,
      numDst = 3, numTrees = 20).collect()
    assert(out.nonEmpty)
    val scores = out.map(r =>
      r.getAs[Long]("wid") -> r.getAs[Double]("change_score"))
    scores.foreach { case (_, s) =>
      assert(!s.isNaN && s >= -1e-9 && s <= 2.0 + 1e-9)
    }
    // burst at ts∈[26,30), w=8, stride=4 → wids ⌈(26−8)/4⌉+1..⌊29/4⌋ ≈ 5,6,7
    val best = scores.maxBy(_._2)._1
    assert(Set(5L, 6L, 7L).contains(best), s"best window $best")
  }

  test("attention routing: one window, bounded ranks, burst hub attended") {
    val feats = Features.accountFeaturesByWindow(
      Windows.withWindowId(edges, 8, 4))
    val focus = AaAr.focusScores(feats, numTrees = 20)
      .persist()
    val changes = AaAr.runFromFocus(focus, sketchNum = 32, backWs = 3,
      numDst = 3)
    val att = AaAr.attentionRouting(focus, changes, numFigures = 2,
      numAccounts = 3).collect()
    assert(att.nonEmpty)
    assert(att.map(_.getAs[Long]("wid")).toSet.size == 1) // one window
    assert(att.map(_.getAs[Int]("prank")).toSet.subsetOf(Set(1, 2)))
    assert(att.map(_.getAs[Int]("rnk")).forall(r => r >= 1 && r <= 3))
    focus.unpersist()
  }

  test("sketch table is dense over (wid × ski)") {
    val feats = Features.accountFeaturesByWindow(
      Windows.withWindowId(edges, 8, 4))
    val fs = AaAr.focusScores(feats, numTrees = 10)
    val sk = AaAr.sketches(fs, sketchNum = 16, numDst = 2)
    val counts = sk.groupBy($"wid").agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect()
    assert(counts.forall(_ == 16))
  }
}
