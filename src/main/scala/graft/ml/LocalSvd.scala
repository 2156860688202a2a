package graft.ml

import breeze.linalg.{svd, DenseMatrix}

/** Local truncated SVD (SURVEY M1).
  *
  * The reference takes the principal LEFT singular vector of the trailing
  * sketch matrix Sᵀ (`/root/reference/AA-AR.py:236-238`:
  * `np.linalg.svd(S.T)[0][:,0]`, then abs, then L1-normalize). The matrix
  * is sketch_num × (back_ws−1) ≈ 256×3 — kilobytes — so the decomposition
  * is a per-row LOCAL computation inside a window frame, not a distributed
  * SVD. (At much larger sketch counts `RowMatrix.computeSVD` is the
  * drop-in distributed alternative; the sketch construction deliberately
  * keeps this matrix tiny — that is the whole point of sketching.)
  */
object LocalSvd {

  /** |principal left singular vector| of the (rows × cols) matrix given in
    * row-major order, L1-normalized. `rows` = sketch dimension.
    */
  def principalDirection(rowsData: Array[Array[Double]]): Array[Double] = {
    val m = rowsData.length
    require(m > 0, "empty matrix")
    val n = rowsData(0).length
    val mat = DenseMatrix.tabulate(m, n)((i, j) => rowsData(i)(j))
    val u = svd(mat).U
    val v = Array.tabulate(m)(i => math.abs(u(i, 0)))
    val s = v.sum
    if (s == 0.0) v else v.map(_ / s)
  }
}
