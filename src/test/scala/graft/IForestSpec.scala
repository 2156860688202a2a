package graft

import graft.ml.IForest
import org.scalatest.funsuite.AnyFunSuite

/** M3 isolation forest: detection-level assertions (SURVEY §7.4 — raw
  * sklearn score parity is impossible across RNGs; rankings are the
  * contract).
  */
class IForestSpec extends AnyFunSuite {

  test("avgPathLength matches the published c(n)") {
    assert(IForest.avgPathLength(1) == 0.0)
    assert(IForest.avgPathLength(2) == 1.0)
    // c(256) ≈ 10.24 (Liu et al. §4)
    val c256 = IForest.avgPathLength(256)
    assert(c256 > 9.5 && c256 < 11.0)
  }

  test("isolated outlier scores higher than the dense cluster") {
    val rng = new scala.util.Random(7)
    val cluster = Array.fill(300)(
      Array(rng.nextGaussian() * 0.1, rng.nextGaussian() * 0.1))
    val outlier = Array(8.0, 8.0)
    val pts = cluster :+ outlier
    val f = IForest.fit(pts, numTrees = 100, sampleSize = 256, tag = "t42")
    val oScore = f.score(outlier)
    val cScores = cluster.map(f.score)
    assert(oScore > 0.6, s"outlier score $oScore")
    assert(oScore > cScores.max,
      s"outlier $oScore vs max inlier ${cScores.max}")
  }

  test("scores are in (0, 1) and deterministic under seed") {
    val rng = new scala.util.Random(3)
    val pts = Array.fill(100)(Array(rng.nextDouble(), rng.nextDouble()))
    val f1 = IForest.fit(pts, 50, 64, tag = "t9")
    val f2 = IForest.fit(pts, 50, 64, tag = "t9")
    pts.foreach { p =>
      val s = f1.score(p)
      assert(s > 0.0 && s < 1.0)
      assert(s == f2.score(p))
    }
  }

  test("uniform data centers near 0.5") {
    val rng = new scala.util.Random(11)
    val pts = Array.fill(500)(Array(rng.nextDouble(), rng.nextDouble()))
    val f = IForest.fit(pts, 100, 256, tag = "t1")
    val mean = pts.map(f.score).sum / pts.length
    assert(mean > 0.35 && mean < 0.6, s"mean=$mean")
  }
}
