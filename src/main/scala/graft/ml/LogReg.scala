package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression via IRLS (iteratively reweighted least
  * squares) — the workhorse behind fasttext-style document-quality
  * classifiers, trained WITHOUT a per-row ML runtime: every Newton step is
  * one aggregation pass that reduces the full table to the p(p+1)/2 + p
  * sufficient statistics of the weighted normal equations (X'WX upper
  * triangle and X'Wz), and the p×p solve happens on the driver where it is
  * O(p³) with p ~ a handful of hand features.
  *
  * Why this shape at 100 TB: the per-iteration cost is a map + partial
  * aggregation (each task emits ONE row of p² doubles — map-side combine
  * makes the shuffle p² values per task, not per row), so training cost is
  * `iters` linear scans with zero data shuffle. Compare a gradient-descent
  * loop over collected vectors (driver-bound) or an MLlib pipeline
  * (per-row JVM object churn): the closed-form sufficient-statistics pass
  * is the only shape where the cluster does nothing but scan and add.
  *
  * Determinism: the fit is a pure function of the input up to
  * floating-point reduce order; consumers that need an engine-independent
  * mirror embed the FITTED weights as plan literals (the q40/q50 trained-
  * quantizer convention) so scoring is bit-reproducible outside Spark.
  */
object LogReg {

  /** Fit `P(label=1 | x)` with an intercept. Returns `p+1` weights
    * ordered `[w0 (intercept), w(features(0)), …]`.
    *
    * @param df       input; only `labelCol` and `features` are read
    * @param features numeric feature column names (cast to double)
    * @param labelCol boolean-or-numeric label column (1.0 = positive)
    * @param iters    fixed Newton step count — IRLS on a well-conditioned
    *                 ridge system converges in ~6 steps; a fixed count
    *                 keeps the pass structure static for plan reuse
    * @param ridge    L2 regularizer added to the normal-equation diagonal
    *                 (not the intercept); also the guard that keeps the
    *                 solve well-posed when classes are separable
    */
  def fitIrls(df: DataFrame, features: Seq[String], labelCol: String,
              iters: Int = 8, ridge: Double = 1e-3): Array[Double] = {
    val p = features.length + 1
    // one narrow projection, persisted: `iters` aggregation passes re-read
    // these few doubles, not the source text
    val base = df.select(
      (col(labelCol).cast("double").as("__y") +:
        features.zipWithIndex.map { case (f, i) =>
          col(f).cast("double").as(s"__x$i") }): _*)
      .persist()
    try {
      val xs: IndexedSeq[Column] =
        lit(1.0) +: (0 until p - 1).map(i => col(s"__x$i"))
      var w = Array.fill(p)(0.0)
      for (_ <- 0 until iters) {
        val eta = xs.zip(w).map { case (x, wi) => x * wi }.reduce(_ + _)
        val mu = lit(1.0) / (lit(1.0) + exp(-eta))
        // working weight floored: a saturated row (mu ≈ 0 or 1) must not
        // turn the working response z into ±Inf
        val wt = greatest(mu * (lit(1.0) - mu), lit(1e-12))
        val z = eta + (col("__y") - mu) / wt
        val aggs =
          (for { i <- 0 until p; j <- i until p }
            yield sum(wt * xs(i) * xs(j)).as(s"a_${i}_$j")) ++
            (0 until p).map(i => sum(wt * z * xs(i)).as(s"b_$i"))
        val r = base.agg(aggs.head, aggs.tail: _*).head()
        // sum() over zero rows is null — surface "no training rows" as a
        // clear error instead of an NPE deep inside the normal equations
        require(!r.isNullAt(0),
          "fitIrls: training frame has no rows (upstream filter left " +
            "nothing to fit)")
        val a = Array.ofDim[Double](p, p)
        var k = 0
        for { i <- 0 until p; j <- i until p } {
          a(i)(j) = r.getDouble(k); a(j)(i) = r.getDouble(k); k += 1
        }
        val b = Array.tabulate(p)(i => r.getDouble(k + i))
        // ridge on the feature diagonal only — penalizing the intercept
        // would bias the base rate
        for (i <- 1 until p) a(i)(i) += ridge
        w = solve(a, b)
      }
      w
    } finally { base.unpersist(); () }
  }

  /** Literal-weight logit `w0 + x₁·w₁ + …` (left-associated, so the
    * double arithmetic is reproducible term-for-term in any engine) —
    * the map-only scoring projection for a fitted model.
    */
  def logit(w: Array[Double], features: Seq[String]): Column =
    (lit(1.0) * w(0) +:
      features.zipWithIndex.map { case (f, i) => col(f) * w(i + 1) })
      .reduce(_ + _)

  /** In-place Gaussian elimination with partial pivoting — p is tiny
    * (hand-picked features + intercept), so the driver-local O(p³) solve
    * is nanoseconds next to one cluster scan.
    */
  private[graft] def solve(a0: Array[Array[Double]],
                        b0: Array[Double]): Array[Double] = {
    val p = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (c <- 0 until p) {
      var piv = c
      for (r <- c + 1 until p)
        if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      if (piv != c) {
        val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = b(c); b(c) = b(piv); b(piv) = tb
      }
      require(math.abs(a(c)(c)) > 1e-30,
        s"singular normal equations at column $c (add ridge)")
      for (r <- c + 1 until p) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c until p) a(r)(j) -= f * a(c)(j)
        b(r) -= f * b(c)
      }
    }
    val w = new Array[Double](p)
    for (c <- p - 1 to 0 by -1) {
      var s = b(c)
      for (j <- c + 1 until p) s -= a(c)(j) * w(j)
      w(c) = s / a(c)(c)
    }
    w
  }
}
