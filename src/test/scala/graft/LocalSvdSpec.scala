package graft

import graft.ml.LocalSvd
import org.scalatest.funsuite.AnyFunSuite

/** M1: |principal left singular vector|, L1-normalized
  * (`AA-AR.py:236-238`).
  */
class LocalSvdSpec extends AnyFunSuite {

  test("rank-1 matrix recovers the generating direction") {
    // M = u · vᵀ with u = (3, 4) → |u|/‖u‖₁ = (3/7, 4/7)
    val u = Array(3.0, 4.0)
    val v = Array(1.0, 2.0, 5.0)
    val m = Array.tabulate(2, 3)((i, j) => u(i) * v(j))
    val got = LocalSvd.principalDirection(m)
    assert(math.abs(got(0) - 3.0 / 7) < 1e-12)
    assert(math.abs(got(1) - 4.0 / 7) < 1e-12)
  }

  test("output is L1-normalized and non-negative") {
    val m = Array(
      Array(1.0, -2.0, 0.5),
      Array(-1.5, 0.3, 2.0),
      Array(0.7, 0.7, -0.1))
    val got = LocalSvd.principalDirection(m)
    assert(math.abs(got.sum - 1.0) < 1e-12)
    assert(got.forall(_ >= 0.0))
  }
}
