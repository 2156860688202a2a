package graft.ml

import graft.util.PortableHash.{h28, md5Hex}

/** Isolation Forest (SURVEY M3) — the reference fits sklearn's
  * `IsolationForest(n_estimators=100, contamination='auto')` per
  * (window, feature-pair) group on 2-D log-features and scores the same
  * points (`/root/reference/AA-AR.py:83-87`, score = −decision_function
  * + 0.5, which for sklearn's 'new' behaviour is exactly the Liu et al.
  * anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) ∈ (0, 1)).
  *
  * This is a from-scratch implementation of the published algorithm
  * (Liu, Ting, Zhou, "Isolation Forest", ICDM 2008): trees on subsamples
  * of ψ = min(256, n), uniform random split dimension + uniform random
  * split point, depth cap ⌈log2 ψ⌉, path length corrected by c(ψ).
  *
  * DERANDOMIZED (round 11): every draw is a tag-keyed md5 hash
  * ([[graft.util.PortableHash]]), not a sequential RNG —
  *   - subsample slot j of tree t:      index = h28("tag|t|s|j") % n
  *   - node at heap path p of tree t:   ONE digest md5("tag|t|n|p");
  *     split dimension from hex chars 1..7, split fraction (ppm) from
  *     chars 9..23
  * so the whole fit is a pure function of (sorted points, tag) that a SQL
  * engine replays level-by-level — the same idiom that put the SmurfGen
  * fold grid under the hash gate in round 9. Path lengths are
  * ppm-QUANTIZED integers (depth·10⁶ + cPpm(leafSize)) so the per-point
  * sum over trees is exact under any summation order; the only
  * transcendental steps left are the shared [[cPpm]] LITERAL table (emitted
  * verbatim into the oracle SQL, so ln never re-evaluates cross-engine)
  * and the final 2^x, which every consumer either rounds (q34's 2-dp face)
  * or re-quantizes (the sketch stage's score ppm).
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

  /** ppm-quantized c(n) for n = 0..256 — the ONE shared literal table both
    * the Scala fit and the DuckDB mirror index, so ln is never recomputed
    * cross-engine (1-ulp libm differences would otherwise sit exactly on
    * round boundaries). 257 entries cover every possible leaf size and ψ.
    */
  val cPpm: Array[Long] =
    Array.tabulate(257)(s => math.round(avgPathLength(s.toLong) * 1e6))

  /** ⌈log2 ψ⌉ with a floor of 1, via integer doubling — NOT
    * ceil(log(ψ)/log(2)), whose 1-ulp slack flips at exact powers of two
    * differently per engine. Mirrored in SQL as a ≤8-rung CASE ladder.
    */
  def depthCap(psi: Int): Int = {
    var d = 1
    while ((1 << d) < psi) d += 1
    d
  }

  /** One tree, array-encoded for iterative traversal. Nodes are PACKED 4
    * doubles wide at offset 4i: [dim, split, leftId, rightId]; the leaf's
    * ppm path-length contribution depth·10⁶ + cPpm(leaf_size) lives in
    * `values(id)` (depth is fixed per node, so the whole contribution
    * folds into the leaf). Leaves SELF-LOOP (dim = 0, split = +∞,
    * left = right = self), so a walk of exactly `depth` steps always ends
    * on the right leaf with no per-step termination test — a fixed trip
    * count lets the batch scorer run several independent point walks in
    * flight at once, hiding the serial load→compare→load latency that
    * dominates this hot path (rows × trees × depth dependent loads).
    */
  final class FlatTree(val nodes: Array[Double], val values: Array[Long],
                       val depth: Int) extends Serializable {
    def pathPpm(x: Array[Double]): Long = {
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

    private val cPsiPpm: Long =
      if (sampleSize <= 256) cPpm(math.max(sampleSize, 0)) else 0L

    private def toScore(ePpm: Long): Double =
      math.pow(2.0, -ePpm.toDouble /
        (trees.length.toDouble * cPsiPpm.toDouble))

    /** Anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) ∈ (0, 1); higher = more
      * anomalous. Equals the reference's `−decision_function + 0.5`.
      */
    def score(x: Array[Double]): Double = {
      if (trees.isEmpty || cPsiPpm == 0L) return 0.5
      var s = 0L
      var i = 0
      while (i < trees.length) { s += trees(i).pathPpm(x); i += 1 }
      toScore(s)
    }

    /** Batch scoring, tree-outer / point-inner: each ~16 KB tree stays hot
      * in L1 across the whole point batch instead of the full forest
      * being re-walked per point, and four point walks run interleaved per
      * iteration — the fixed-depth self-looping encoding makes the four
      * load chains independent, so the CPU overlaps their latencies.
      * Identical results to `score` applied row-wise.
      */
    def scoreAll(xs: Array[Array[Double]]): Array[Double] = {
      val n = xs.length
      val out = new Array[Double](n)
      if (trees.isEmpty || cPsiPpm == 0L) {
        java.util.Arrays.fill(out, 0.5)
        return out
      }
      val acc = new Array[Long](n)
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
          acc(i) += vals(b0 >> 2); acc(i + 1) += vals(b1 >> 2)
          acc(i + 2) += vals(b2 >> 2); acc(i + 3) += vals(b3 >> 2)
          i += 4
        }
        while (i < n) { acc(i) += tree.pathPpm(xs(i)); i += 1 }
        t += 1
      }
      var i = 0
      while (i < n) { out(i) = toScore(acc(i)); i += 1 }
      out
    }
  }

  /** Growable builder emitting the packed flat encoding directly. */
  private final class TreeBuilder {
    private var nodes = new Array[Double](4 * 64)
    private var values = new Array[Long](64)
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
      values(id) = depth.toLong * 1000000L + cPpm(size)
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

  /** Recursive build keyed by the heap path `p` (root 1, children 2p and
    * 2p+1) — tag-keyed draws make sibling subtrees independent, which is
    * exactly what lets the SQL mirror grow all nodes of a level at once.
    */
  private def buildNode(b: TreeBuilder, points: Array[Array[Double]],
                        idx: Array[Int], depth: Int, maxDepth: Int,
                        treeTag: String, p: Long): Int = {
    if (idx.length <= 1 || depth >= maxDepth)
      return b.leaf(depth, idx.length)
    val nDims = points(idx(0)).length
    // ONE digest per node: split dimension from hex chars 1..7, split
    // fraction from chars 9..23. If the drawn dimension has no spread,
    // probe the remaining dims in cyclic order (the no-spread dim can't
    // split); all-identical points become a leaf.
    val hex = md5Hex(s"$treeTag|n|$p")
    val start = (java.lang.Long.parseLong(hex.substring(0, 7), 16)
      % nDims).toInt
    val uPpm = java.lang.Long.parseLong(hex.substring(8, 23), 16) % 1000000L
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
    val split = lo + (uPpm / 1000000.0) * (hi - lo)
    val (l, r) = idx.partition(i => points(i)(chosen) < split)
    if (l.isEmpty || r.isEmpty) return b.leaf(depth, idx.length)
    val id = b.split(chosen, split)
    val loId = buildNode(b, points, l, depth + 1, maxDepth, treeTag, 2L * p)
    val hiId = buildNode(b, points, r, depth + 1, maxDepth, treeTag,
      2L * p + 1L)
    b.wire(id, loId, hiId)
    id
  }

  /** Fit a forest. ψ = min(sampleSize, n); depth cap ⌈log2 ψ⌉ as in the
    * paper and sklearn. Subsampling is with replacement, slot j of tree t
    * drawing index h28("tag|t|s|j") % n over the points AS GIVEN — callers
    * must present a deterministic order (focusScores sorts by account).
    * Deterministic under `tag`; bit-reproducible by any engine with md5.
    */
  def fit(points: Array[Array[Double]], numTrees: Int = 100,
          sampleSize: Int = 256, tag: String = "if|0"): Forest = {
    val n = points.length
    if (n == 0) return Forest(Array.empty, 0)
    val psi = math.min(sampleSize, n)
    val maxDepth = depthCap(psi)
    val trees = Array.tabulate(numTrees) { t =>
      val treeTag = s"$tag|$t"
      val sample = Array.tabulate(psi)(j =>
        (h28(s"$treeTag|s|$j") % n).toInt) // subsample w/ replacement
      val b = new TreeBuilder
      buildNode(b, points, sample, 0, maxDepth, treeTag, 1L)
      b.result(maxDepth)
    }
    Forest(trees, psi)
  }
}
