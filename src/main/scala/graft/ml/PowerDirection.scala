package graft.ml

/** Principal direction of the trailing sketch frame (SURVEY M1,
  * `/root/reference/AA-AR.py:236-238`: `np.linalg.svd(S.T)[0][:,0]` then
  * abs) — computed as a FIXED 100-step power iteration on the k×k Gram
  * matrix (k = backWs−1 = 3) instead of LAPACK.
  *
  * Why not Breeze/LAPACK ([[LocalSvd]], the round-3 implementation):
  * LAPACK's bidiagonalization is not reproducible outside the JVM, which
  * kept the change-score pipeline `no_oracle`. A fixed-trip-count power
  * iteration is the SAME mathematical object (top left singular vector =
  * M·v₁ for v₁ the top eigenvector of MᵀM; the |·| the reference takes
  * right after erases the sign ambiguity) built from nothing but IEEE
  * +,*,/,sqrt in a pinned fold order — every operation is correctly
  * rounded, so the DuckDB mirror replays it BIT-IDENTICALLY and q31/q45
  * hash-check. 100 iterations drive the iteration error to fp-noise for
  * any spectral gap the pipeline meets (LocalSvdSpec pins agreement with
  * LAPACK to 1e-9 on conditioned frames); a gapless frame converges to
  * SOME unit vector of the top eigenspace — deterministically the same
  * one in both engines, which is all the hash gate needs.
  *
  * Fold-order contract (mirrored token-for-token in the SQL):
  *   Gram g_ab    = ((0 + a₀b₀) + a₁b₁) + …   — list_dot_product's fold
  *   matvec w_a   = ((g_a0·v₀) + g_a1·v₁) + g_a2·v₂
  *   norm         = sqrt((w₀² + w₁²) + w₂²)
  *   direction uᵢ = ((col₀ᵢ·v₀) + col₁ᵢ·v₁) + col₂ᵢ·v₂, then |uᵢ|
  * A zero frame yields the zero vector (norm 0 short-circuits to 0), the
  * same degenerate handling changeScores' try_divide path expects.
  */
object PowerDirection {

  val Iterations = 100

  /** |principal left singular vector| (UN-normalized — every consumer
    * rescales, and cosine is scale-invariant) of the m×k matrix whose
    * COLUMNS are `cols`, the trailing sketches in chronological order.
    */
  def principalAbs(cols: Array[Array[Double]]): Array[Double] = {
    val k = cols.length
    val m = if (k == 0) 0 else cols(0).length
    val g = Array.ofDim[Double](k, k)
    var a = 0
    while (a < k) {
      var b = 0
      while (b < k) {
        var s = 0.0
        var i = 0
        while (i < m) { s += cols(a)(i) * cols(b)(i); i += 1 }
        g(a)(b) = s
        b += 1
      }
      a += 1
    }
    var v = Array.fill(k)(1.0)
    var it = 0
    while (it < Iterations) {
      val w = new Array[Double](k)
      a = 0
      while (a < k) {
        var s = 0.0
        var b = 0
        while (b < k) { s += g(a)(b) * v(b); b += 1 }
        w(a) = s
        a += 1
      }
      var n2 = 0.0
      a = 0
      while (a < k) { n2 += w(a) * w(a); a += 1 }
      val nrm = math.sqrt(n2)
      if (nrm > 0.0) {
        a = 0
        while (a < k) { v(a) = w(a) / nrm; a += 1 }
      } else {
        java.util.Arrays.fill(v, 0.0)
      }
      it += 1
    }
    Array.tabulate(m) { i =>
      var s = 0.0
      var c = 0
      while (c < k) { s += cols(c)(i) * v(c); c += 1 }
      math.abs(s)
    }
  }
}
