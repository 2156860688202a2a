package graft.ml

import scala.util.Random

/** Isolation Forest (SURVEY M3) — the reference fits sklearn's
  * `IsolationForest(n_estimators=100, contamination='auto')` per
  * (window, feature-pair) group on 2-D log-features and scores the same
  * points (`/root/reference/AA-AR.py:83-87`, score = −decision_function
  * + 0.5, which for sklearn's 'new' behaviour is exactly the Liu et al.
  * anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) ∈ (0, 1)).
  *
  * sklearn's exact scores are not bit-reproducible across RNGs (SURVEY
  * §7.4), so parity is asserted on *rankings/detection*, not raw scores.
  * This is a from-scratch implementation of the published algorithm
  * (Liu, Ting, Zhou, "Isolation Forest", ICDM 2008): trees on subsamples
  * of ψ = min(256, n), uniform random split dimension + uniform random
  * split point, depth cap ⌈log2 ψ⌉, path length corrected by c(ψ).
  *
  * Distribution strategy: a forest is a few KB; groups (window × pair) are
  * independent. Fit+score runs inside `flatMapGroups` — each executor
  * builds the forest for its groups locally and scores the group's rows in
  * one pass. At 100 TB the group count grows with windows (not data volume)
  * and per-group row counts grow with accounts; the fit subsamples to ψ so
  * fit cost is O(trees·ψ log ψ) regardless of group size, and scoring is
  * O(rows·trees·depth) streaming.
  */
object IForest {

  /** Average unsuccessful-search path length in a BST of n nodes. */
  def avgPathLength(n: Long): Double =
    if (n <= 1L) 0.0
    else if (n == 2L) 1.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) -
      2.0 * (n - 1.0) / n

  /** One tree, array-encoded for iterative traversal: node i splits on
    * `dims(i)` at `splits(i)` (children `lefts(i)`/`rights(i)`), or is a
    * leaf when dims(i) < 0 with `values(i)` = depth + c(leaf_size)
    * precomputed (depth is fixed per node, so the whole path-length
    * contribution folds into the leaf). Scoring touches 4 primitive
    * arrays in a tight loop — no virtual dispatch, no boxing; this is the
    * hot path of the focus-plot stage (rows × trees × depth node visits).
    */
  final class FlatTree(val dims: Array[Int], val splits: Array[Double],
                       val lefts: Array[Int], val rights: Array[Int],
                       val values: Array[Double]) extends Serializable {
    def pathLength(x: Array[Double]): Double = {
      var i = 0
      var d = dims(i)
      while (d >= 0) {
        i = if (x(d) < splits(i)) lefts(i) else rights(i)
        d = dims(i)
      }
      values(i)
    }
  }

  final case class Forest(trees: Array[FlatTree], sampleSize: Int)
      extends Serializable {

    private val cPsi = avgPathLength(sampleSize.toLong)

    /** Anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) ∈ (0, 1); higher = more
      * anomalous. Equals the reference's `−decision_function + 0.5`.
      */
    def score(x: Array[Double]): Double = {
      if (trees.isEmpty || cPsi == 0.0) return 0.5
      var s = 0.0
      var i = 0
      while (i < trees.length) { s += trees(i).pathLength(x); i += 1 }
      math.pow(2.0, -(s / trees.length) / cPsi)
    }
  }

  /** Growable builder emitting the flat encoding directly. */
  private final class TreeBuilder {
    private val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val splits = scala.collection.mutable.ArrayBuffer.empty[Double]
    private val lefts = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val rights = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val values = scala.collection.mutable.ArrayBuffer.empty[Double]

    def leaf(depth: Int, size: Int): Int = {
      val id = dims.length
      dims += -1; splits += 0.0; lefts += -1; rights += -1
      values += depth + avgPathLength(size.toLong)
      id
    }

    def split(dim: Int, value: Double): Int = {
      val id = dims.length
      dims += dim; splits += value; lefts += -1; rights += -1; values += 0.0
      id
    }

    def wire(id: Int, lo: Int, hi: Int): Unit = {
      lefts(id) = lo; rights(id) = hi
    }

    def result(): FlatTree = new FlatTree(dims.toArray, splits.toArray,
      lefts.toArray, rights.toArray, values.toArray)
  }

  private def buildNode(b: TreeBuilder, points: Array[Array[Double]],
                        idx: Array[Int], depth: Int, maxDepth: Int,
                        rng: Random): Int = {
    if (idx.length <= 1 || depth >= maxDepth)
      return b.leaf(depth, idx.length)
    val nDims = points(idx(0)).length
    // pick a dimension with spread; give up after trying all dims
    val dims = rng.shuffle((0 until nDims).toList)
    var chosen = -1
    var lo = 0.0
    var hi = 0.0
    val it = dims.iterator
    while (chosen < 0 && it.hasNext) {
      val d = it.next()
      var mn = Double.MaxValue
      var mx = Double.MinValue
      var i = 0
      while (i < idx.length) {
        val v = points(idx(i))(d)
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      if (mx > mn) { chosen = d; lo = mn; hi = mx }
    }
    if (chosen < 0) return b.leaf(depth, idx.length) // all identical
    val split = lo + rng.nextDouble() * (hi - lo)
    val (l, r) = idx.partition(i => points(i)(chosen) < split)
    if (l.isEmpty || r.isEmpty) return b.leaf(depth, idx.length)
    val id = b.split(chosen, split)
    val loId = buildNode(b, points, l, depth + 1, maxDepth, rng)
    val hiId = buildNode(b, points, r, depth + 1, maxDepth, rng)
    b.wire(id, loId, hiId)
    id
  }

  /** Fit a forest. ψ = min(sampleSize, n); depth cap ⌈log2 ψ⌉ as in the
    * paper and sklearn. Deterministic under `seed`.
    */
  def fit(points: Array[Array[Double]], numTrees: Int = 100,
          sampleSize: Int = 256, seed: Long = 0L): Forest = {
    val n = points.length
    val psi = math.min(sampleSize, n)
    if (n == 0) return Forest(Array.empty, 0)
    val maxDepth = math.max(1, math.ceil(
      math.log(psi.toDouble) / math.log(2.0)).toInt)
    val rng = new Random(seed)
    val trees = Array.tabulate(numTrees) { _ =>
      val sample = Array.fill(psi)(rng.nextInt(n)) // subsample w/ replacement
      val b = new TreeBuilder
      buildNode(b, points, sample, 0, maxDepth, rng)
      b.result()
    }
    Forest(trees, psi)
  }
}
