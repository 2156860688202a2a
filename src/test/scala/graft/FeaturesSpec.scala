package graft

import graft.ops.Features

/** A1-A8 numpy-semantics pinning (SURVEY §5): var_pop not var_samp,
  * interpolating median, zero defaults for empty sides
  * (`AA-AR.py:22-66`).
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  // graph: 1→2 (w=10), 1→2 (w=20), 3→2 (w=5), 2→3 (w=7)
  private lazy val edges =
    Seq((1L, 2L, 10L, 0L), (1L, 2L, 20L, 1L), (3L, 2L, 5L, 2L),
        (2L, 3L, 7L, 3L))
      .toDF("src", "dst", "weight", "ts")

  private lazy val feats = Features.accountFeatures(edges)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("degrees: unique vs multi") {
    val a2 = feats(2L)
    assert(a2.getAs[Long]("unique_in_degree") == 2)  // {1, 3}
    assert(a2.getAs[Long]("multi_in_degree") == 3)   // 3 incoming edges
    assert(a2.getAs[Long]("unique_out_degree") == 1) // {3}
    assert(a2.getAs[Long]("multi_out_degree") == 1)
  }

  test("weights: sum / mean / interpolating median / population variance") {
    val a2 = feats(2L)
    assert(a2.getAs[Long]("total_in_weight") == 35)
    assert(a2.getAs[Double]("mean_in_weight") == 35.0 / 3)
    // np.median([5,10,20]) = 10 (odd count, middle)
    assert(a2.getAs[Double]("median_in_weight") == 10.0)
    // np.var([5,10,20]) ddof=0 = mean(x²) − mean(x)² = 175/3 − (35/3)²
    val expVar = (25.0 + 100.0 + 400.0) / 3 - math.pow(35.0 / 3, 2)
    assert(math.abs(a2.getAs[Double]("var_in_weight") - expVar) < 1e-9)

    val a1 = feats(1L)
    // np.median([10,20]) = 15 (even count, interpolated)
    assert(a1.getAs[Double]("median_out_weight") == 15.0)
  }

  test("account with no in-edges gets all-zero in-side (AA-AR.py:34-35)") {
    val a1 = feats(1L)
    assert(a1.getAs[Long]("unique_in_degree") == 0)
    assert(a1.getAs[Long]("multi_in_degree") == 0)
    assert(a1.getAs[Long]("total_in_weight") == 0)
    assert(a1.getAs[Double]("mean_in_weight") == 0.0)
    assert(a1.getAs[Double]("median_in_weight") == 0.0)
    assert(a1.getAs[Double]("var_in_weight") == 0.0)
  }

  test("node universe is union of both endpoints") {
    assert(feats.keySet == Set(1L, 2L, 3L))
  }

  test("property: Σ multi_in_degree = Σ multi_out_degree = |E|") {
    val sumIn = feats.values.map(_.getAs[Long]("multi_in_degree")).sum
    val sumOut = feats.values.map(_.getAs[Long]("multi_out_degree")).sum
    assert(sumIn == 4 && sumOut == 4)
  }

  test("approx mode tracks exact features within sketch tolerance") {
    val rng = new scala.util.Random(5)
    val e = Seq.fill(2000)((rng.nextInt(50).toLong, rng.nextInt(50).toLong,
      rng.nextInt(1000).toLong + 1, rng.nextInt(40).toLong))
      .toDF("src", "dst", "weight", "ts")
    val w = graft.ops.Windows.withWindowId(e, 14, 7)
    val exact = Features.accountFeaturesByWindow(w)
      .select($"wid", $"account", $"unique_out_degree",
        $"median_out_weight", $"total_out_weight")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val approx = Features.accountFeaturesApprox(w).select($"wid",
      $"account", $"unique_out_degree", $"median_out_weight",
      $"total_out_weight").collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val ex = exact((r.getLong(0), r.getLong(1)))
      // exact aggregates are identical; sketches within tolerance
      assert(r.getLong(4) == ex.getLong(4)) // total = exact sum either way
      val ud = r.getLong(2).toDouble
      val udEx = ex.getLong(2).toDouble
      assert(udEx == 0.0 || math.abs(ud - udEx) / udEx <= 0.15)
      // approx median picks an actual sample point; exact interpolates
      // between the two middles — on tiny uniform groups the gap can be
      // wide, so pin only the order of magnitude + sign agreement
      val mEx = ex.getDouble(3)
      assert(mEx == 0.0 || (r.getDouble(3) > 0.0 &&
        math.abs(r.getDouble(3) - mEx) / mEx <= 1.0))
    }
  }

  test("approx-median 2x bound: a theorem inside the exact regime " +
    "(group size <= pinned accuracy), empirically violable beyond it") {
    import org.apache.spark.sql.functions.expr
    // adversarial heavy-tailed non-negative group, odd n = 1001:
    // sorted values are 501 ones then 500 millions, so the interpolating
    // median is the middle order statistic v[500] = 1 and ANY rank slip
    // past the cliff returns 1e6 — a 1e6x value error. Descending
    // insertion order + a pinned 4-slice partitioning make the sketch
    // merge deterministic, so both sides of the boundary are exact
    // assertions, not flaky ones.
    val vals = (Seq.fill(500)(1000000L) ++ Seq.fill(501)(1L)).toList
    val df = spark.sparkContext.parallelize(vals, 4).toDF("w")
    def approxMed(acc: Int): Double = df
      .agg(expr(s"percentile_approx(w, 0.5, $acc)").cast("double"))
      .head().getDouble(0)
    val exactMed = 1.0
    // exact regime: group size (1001) <= accuracy (10000, the operator's
    // pinned value) — the sketch returns the middle order statistic, so
    // the q62 ok_median_* 2x flag bound holds even on this cliff
    val inRegime = approxMed(Features.ApproxMedianAccuracy)
    assert(inRegime == exactMed)
    assert(math.abs(inRegime - exactMed) / exactMed <= 1.0)
    // beyond the regime: same data, accuracy 5 << group size — the
    // ~n/accuracy rank error walks off the cliff and the returned
    // element violates the 2x value bound by orders of magnitude.
    // This is WHY the operator pins accuracy and the q62 contract is
    // conditional on group size (Features.scala ApproxMedianAccuracy).
    val outRegime = approxMed(5)
    assert(math.abs(outRegime - exactMed) / exactMed > 1.0,
      s"expected a 2x-bound violation outside the regime, got $outRegime")
  }

  test("windowed variant groups by (wid, account)") {
    val e = Seq((1L, 2L, 10L, 0L), (1L, 2L, 30L, 20L))
      .toDF("src", "dst", "weight", "ts")
    val w = graft.ops.Windows.withWindowId(e, 14, 7)
    val f = Features.accountFeaturesByWindow(w)
      .select($"wid", $"account", $"total_out_weight")
      .as[(Long, Long, Long)].collect().toSet
    // ts 0 → wid 0 only; ts 20 is past last window start (range(0, 6, 7)={0})
    assert(f.contains((0L, 1L, 10L)))
  }

  test("random graphs: every stat equals the brute-force per-account value") {
    // seeded random multigraphs with deliberate degenerate shapes: heavy
    // duplicate weights (small weight range), accounts that appear on one
    // side only, parallel edges, self-loops
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 2 + rng.nextInt(8)
      val m = 1 + rng.nextInt(40)
      val es = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong,
        1L + rng.nextInt(5).toLong, rng.nextInt(10).toLong))
      val got = Features.accountFeatures(es.toDF("src", "dst", "weight", "ts"))
        .collect().map(r => r.getLong(0) -> r).toMap

      def stats(ws: Seq[Long]): (Long, Long, Double, Double, Double) =
        if (ws.isEmpty) (0L, 0L, 0.0, 0.0, 0.0)
        else {
          val s = ws.sorted.map(_.toDouble)
          val mean = s.sum / s.size
          val med = if (s.size % 2 == 1) s(s.size / 2)
                    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
          val vr = s.map(x => (x - mean) * (x - mean)).sum / s.size
          (ws.sum, ws.size.toLong, mean, med, vr)
        }

      val accounts = es.flatMap(e => Seq(e._1, e._2)).distinct
      assert(got.keySet == accounts.toSet)
      for (a <- accounts) {
        val ins = es.filter(_._2 == a)
        val outs = es.filter(_._1 == a)
        val (ti, ni, mi, di, vi) = stats(ins.map(_._3))
        val (to, no, mo, dm, vo) = stats(outs.map(_._3))
        val r = got(a)
        assert(r.getAs[Long]("unique_in_degree") == ins.map(_._1).distinct.size)
        assert(r.getAs[Long]("unique_out_degree") == outs.map(_._2).distinct.size)
        assert(r.getAs[Long]("multi_in_degree") == ni)
        assert(r.getAs[Long]("multi_out_degree") == no)
        assert(r.getAs[Long]("total_in_weight") == ti)
        assert(r.getAs[Long]("total_out_weight") == to)
        assert(math.abs(r.getAs[Double]("mean_in_weight") - mi) < 1e-12)
        assert(math.abs(r.getAs[Double]("mean_out_weight") - mo) < 1e-12)
        assert(r.getAs[Double]("median_in_weight") == di,
          s"trial $trial acct $a median_in")
        assert(r.getAs[Double]("median_out_weight") == dm,
          s"trial $trial acct $a median_out")
        assert(math.abs(r.getAs[Double]("var_in_weight") - vi) < 1e-9)
        assert(math.abs(r.getAs[Double]("var_out_weight") - vo) < 1e-9)
      }
    }
  }
}
