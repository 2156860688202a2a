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

  /** One tree, array-encoded for iterative traversal. Nodes are PACKED 4
    * doubles wide at offset 4i: [dim, split, leftId, rightId]; the leaf's
    * path-length contribution depth + c(leaf_size) lives in `values(id)`
    * (depth is fixed per node, so the whole contribution folds into the
    * leaf). Leaves SELF-LOOP (dim = 0, split = +∞, left = right = self),
    * so a walk of exactly `depth` steps always ends on the right leaf with
    * no per-step termination test — a fixed trip count lets the batch
    * scorer run several independent point walks in flight at once, hiding
    * the serial load→compare→load latency that dominates this hot path
    * (rows × trees × depth dependent loads).
    */
  final class FlatTree(val nodes: Array[Double], val values: Array[Double],
                       val depth: Int) extends Serializable {
    def pathLength(x: Array[Double]): Double = {
      var b = 0
      var s = 0
      while (s < depth) {
        b = 4 * (if (x(nodes(b).toInt) < nodes(b + 1)) nodes(b + 2)
                 else nodes(b + 3)).toInt
        s += 1
      }
      values(b >> 2)
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

    /** Batch scoring, tree-outer / point-inner: each ~16 KB tree stays hot
      * in L1 across the whole point batch instead of the full forest
      * (~1 MB) being re-walked per point, and four point walks run
      * interleaved per iteration — the fixed-depth self-looping encoding
      * makes the four load chains independent, so the CPU overlaps their
      * latencies. Identical results to `score` applied row-wise.
      */
    def scoreAll(xs: Array[Array[Double]]): Array[Double] = {
      val n = xs.length
      val out = new Array[Double](n)
      if (trees.isEmpty || cPsi == 0.0) {
        java.util.Arrays.fill(out, 0.5)
        return out
      }
      var t = 0
      while (t < trees.length) {
        val tree = trees(t)
        val nd = tree.nodes
        val vals = tree.values
        val depth = tree.depth
        var i = 0
        val lim = n - (n % 4)
        while (i < lim) {
          val x0 = xs(i); val x1 = xs(i + 1)
          val x2 = xs(i + 2); val x3 = xs(i + 3)
          var b0 = 0; var b1 = 0; var b2 = 0; var b3 = 0
          var s = 0
          while (s < depth) {
            b0 = 4 * (if (x0(nd(b0).toInt) < nd(b0 + 1)) nd(b0 + 2)
                      else nd(b0 + 3)).toInt
            b1 = 4 * (if (x1(nd(b1).toInt) < nd(b1 + 1)) nd(b1 + 2)
                      else nd(b1 + 3)).toInt
            b2 = 4 * (if (x2(nd(b2).toInt) < nd(b2 + 1)) nd(b2 + 2)
                      else nd(b2 + 3)).toInt
            b3 = 4 * (if (x3(nd(b3).toInt) < nd(b3 + 1)) nd(b3 + 2)
                      else nd(b3 + 3)).toInt
            s += 1
          }
          out(i) += vals(b0 >> 2); out(i + 1) += vals(b1 >> 2)
          out(i + 2) += vals(b2 >> 2); out(i + 3) += vals(b3 >> 2)
          i += 4
        }
        while (i < n) { out(i) += tree.pathLength(xs(i)); i += 1 }
        t += 1
      }
      var i = 0
      while (i < n) {
        out(i) = math.pow(2.0, -(out(i) / trees.length) / cPsi)
        i += 1
      }
      out
    }
  }

  /** Growable builder emitting the packed flat encoding directly. */
  private final class TreeBuilder {
    private var nodes = new Array[Double](4 * 64)
    private var values = new Array[Double](64)
    private var n = 0

    private def ensure(): Unit =
      if (4 * (n + 1) > nodes.length) {
        nodes = java.util.Arrays.copyOf(nodes, nodes.length * 2)
        values = java.util.Arrays.copyOf(values, values.length * 2)
      }

    def leaf(depth: Int, size: Int): Int = {
      ensure()
      val id = n
      // self-loop: dim 0, split +∞ ⇒ always goes left, left = itself
      nodes(4 * id) = 0.0
      nodes(4 * id + 1) = Double.PositiveInfinity
      nodes(4 * id + 2) = id.toDouble
      nodes(4 * id + 3) = id.toDouble
      values(id) = depth + avgPathLength(size.toLong)
      n += 1
      id
    }

    def split(dim: Int, value: Double): Int = {
      ensure()
      val id = n
      nodes(4 * id) = dim.toDouble
      nodes(4 * id + 1) = value
      n += 1
      id
    }

    def wire(id: Int, lo: Int, hi: Int): Unit = {
      nodes(4 * id + 2) = lo.toDouble
      nodes(4 * id + 3) = hi.toDouble
    }

    def result(maxDepth: Int): FlatTree =
      new FlatTree(java.util.Arrays.copyOf(nodes, 4 * n),
        java.util.Arrays.copyOf(values, n), maxDepth)
  }

  private def buildNode(b: TreeBuilder, points: Array[Array[Double]],
                        idx: Array[Int], depth: Int, maxDepth: Int,
                        rng: Random): Int = {
    if (idx.length <= 1 || depth >= maxDepth)
      return b.leaf(depth, idx.length)
    val nDims = points(idx(0)).length
    // pick a uniformly random dimension; if it has no spread, probe the
    // remaining dims in cyclic order. One rng draw and zero allocations
    // per node — an rng.shuffle(List) here costs more than the whole
    // min/max scan (this runs ~trees × ψ times per fit, × groups).
    val start = rng.nextInt(nDims)
    var chosen = -1
    var lo = 0.0
    var hi = 0.0
    var k = 0
    while (chosen < 0 && k < nDims) {
      val d = (start + k) % nDims
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
      k += 1
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
      b.result(maxDepth)
    }
    Forest(trees, psi)
  }
}
