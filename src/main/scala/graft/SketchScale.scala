package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Sketches

/** Corpus-scale run record for the sketch operators (q93/q94) at ~1000×
  * the bench scale (dev tool, run manually; results recorded in README,
  * like [[TextScale]]/[[MixScale]]).
  *
  * HyperLogLog (default 100M rows, planted so truth is closed-form:
  * key = id mod D over G groups by key mod G ⇒ EXACTLY D/G distinct per
  * group): times the sketch (register build + estimate) against the
  * exact `count(distinct)` on the same rows, asserts every group's
  * estimate inside the ±3σ bound around its planted truth, and asserts
  * the register table is exactly G·m rows — the ENTIRE reduce-side
  * payload, independent of n and of the 5M-per-group key cardinality
  * (the claim that makes the sketch the 100 TB profile operator).
  *
  * Count-Min (same n): 95 planted heavy words of exactly n/100
  * occurrences each (id mod 100, the multiples of 20 diverted) drowned
  * in n/20 singletons. With the production-sized grid (w = 4096, d = 4)
  * the probe must flag ALL 95 planted heavies (one-sidedness ⇒ no false
  * negatives, asserted) and — because a singleton goes heavy only if
  * EVERY row buckets it with ≥1% mass — only a handful of false
  * positives (bound asserted). Every estimate ≥ truth (asserted over
  * all 5M+95 candidates).
  *
  * Prints one JSON line with timings and the asserted stats.
  */
object SketchScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val d = n / 5 // planted distinct keys (each ×5); G groups of d/G
    val g = 4
    require(n % 100 == 0 && d % g == 0 && n % 20 == 0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    // ───── HLL vs exact distinct, closed-form truth d/g per group ─────
    val rows = spark.range(n).select((col("id") % d).as("k"))
      .select(col("k"), (col("k") % g).cast("int").as("g0"))
    val (j, rank) = Sketches.hllRegisterCols(col("k"))
    val tH = t0()
    val regs = rows.select(col("g0"), j.as("j"), rank.as("rank"))
      .groupBy(col("g0"), col("j")).agg(max(col("rank")).as("mj"))
    val ests = Sketches.hllEstimateFromRegisters(regs, Seq("g0"))
      .collect().map(r =>
        r.getAs[Int]("g0") -> r.getAs[Double]("hll_estimate")).toMap
    val hllSec = secs(tH)
    val nRegs = regs.count()
    val tE = t0()
    val exact = rows.groupBy(col("g0"))
      .agg(countDistinct(col("k")).as("x")).collect()
      .map(r => r.getAs[Int]("g0") -> r.getAs[Long]("x")).toMap
    val exactSec = secs(tE)
    val truth = d / g
    exact.foreach { case (grp, x) =>
      assert(x == truth, s"planting broken: group $grp has $x != $truth")
    }
    val worstRelErr = ests.map { case (grp, e) =>
      math.abs(e - truth) / truth.toDouble
    }.max
    assert(worstRelErr <= Sketches.HllBound,
      f"HLL off: worst rel err $worstRelErr%.4f > ${Sketches.HllBound}%.4f")
    assert(nRegs == g.toLong * Sketches.M,
      s"register table $nRegs rows, expected ${g * Sketches.M}")

    // ───── Count-Min heavy hitters, planted 1%-mass heavies ─────
    // id divisible by 20 → a singleton "u<id>"; otherwise the heavy word
    // "w<id mod 100>". id%100==k forces id%20==k%20, so exactly the 95
    // residues k with k%20 != 0 survive as heavy words, each with
    // EXACTLY n/100 occurrences (1% of the corpus — the detection
    // threshold itself, reachable only because estimates are one-sided).
    val words = spark.range(n).select(
      when(col("id") % 20 === 0, concat(lit("u"), col("id")))
        .otherwise(concat(lit("w"), col("id") % 100)).as("word"))
    val tC = t0()
    val hh = Sketches.cmHeavyHitters(words, "word", width = 4096)
      .persist()
    val nCand = hh.count()
    val bad = hh.filter(!col("overcount_ok")).count()
    val heavyFlagged = hh.filter(col("is_heavy"))
      .select(col("word")).collect().map(_.getString(0))
    val cmSec = secs(tC)
    hh.unpersist()
    assert(nCand == n / 20 + 95, s"candidate count $nCand")
    assert(bad == 0, s"$bad estimates below truth — one-sidedness broken")
    val (trueHeavy, falseHeavy) =
      heavyFlagged.partition(_.startsWith("w"))
    assert(trueHeavy.length == 95,
      s"missed planted heavies: ${trueHeavy.length}/95")
    // a singleton is flagged only if all 4 rows bucket it with ≥1% mass
    // (P ≈ (95/4096)^4 per candidate) — a handful at n/20 candidates
    assert(falseHeavy.length <= 50,
      s"${falseHeavy.length} false heavies — grid too loaded")

    // ───── KMV intersection with the q93-guided prefilter ─────
    // A = keys [0, 12M), B = keys [8M, 20M) ⇒ |A∩B| = 4M closed-form.
    // The scale composition the operator scaladoc documents: estimate
    // each group's cardinality from HLL registers (cheap, map-side),
    // turn it into a map-only hash gate h < 2^56·8k/n̂ BEFORE the
    // distinct, and assert the gate was safe (≥ k survivors — every
    // retained hash sits below the gate, so the kth smallest is
    // unchanged and the sketch is exactly the ungated one).
    val kmvK = 4096 // intersection σ ≈ (union/inter)/√k ≈ 3.1 % here
    val sizeA = 12000000L
    val overlap = 4000000L
    val kmvRows = spark.range(sizeA).select(lit("a").as("g"),
        col("id").as("k"))
      .union(spark.range(sizeA).select(lit("b").as("g"),
        (col("id") + (sizeA - overlap)).as("k")))
    val tK = t0()
    val (jK, rankK) = Sketches.hllRegisterCols(col("k"), tag = "kmv-pre")
    val nHat = Sketches.hllEstimateFromRegisters(
      kmvRows.select(col("g"), jK.as("j"), rankK.as("rank"))
        .groupBy(col("g"), col("j")).agg(max(col("rank")).as("mj")),
      Seq("g")).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("hll_estimate"))
      .toMap
    val theta0 = (math.pow(2.0, 56) * 8.0 * kmvK /
      math.min(nHat("a"), nHat("b"))).toLong
    val hCol = org.apache.spark.sql.graft.GraftExprBridge
      .md5Halves(concat_ws("|", lit("kmv"), col("k").cast("string")))
    val gated = kmvRows.filter(hCol < theta0)
    val sk = Sketches.kmvSketch(gated, col("k"), col("g"), k = kmvK)
      .persist()
    val perGroup = sk.groupBy(col("g")).agg(
      count(lit(1)).as("kept"), max(col("hk")).as("hk")).collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("kept"), r.getAs[Long]("hk"))).toMap
    perGroup.foreach { case (grp, (kept, hk)) =>
      assert(kept == kmvK, s"gate bit: group $grp kept $kept < $kmvK")
      assert(hk < theta0, s"gate unsafe: group $grp hk $hk >= $theta0")
    }
    val thetaPair = math.min(perGroup("a")._2, perGroup("b")._2)
    val interSample = sk.filter(col("g") === "a")
      .select(col("h")).intersect(
        sk.filter(col("g") === "b").select(col("h")))
      .filter(col("h") < thetaPair).count()
    sk.unpersist()
    val kmvEst = interSample.toDouble * math.pow(2.0, 56) /
      thetaPair.toDouble
    val kmvSec = secs(tK)
    val kmvRelErr = math.abs(kmvEst - overlap) / overlap.toDouble
    assert(kmvRelErr <= 0.12,
      f"KMV intersection off: $kmvEst%.0f vs $overlap (rel $kmvRelErr%.3f)")

    // ───── dyadic-CM quantiles, closed-form uniform truth ─────
    // values = id mod 10k, each exactly n/10k times ⇒ true_rank(x) =
    // (x+1)·n/10⁴ and the exact φ-quantile is ⌈φ·10⁴⌉ − 1 in closed
    // form. Production-sized width (2048): per-probed-node expected
    // overcount ≈ n/w, a ~0.1 % rank shift — assert the estimated
    // quantile lands within 2 % of truth while staying one-sided.
    val dWidth = 2048
    val vals = spark.range(n).select((col("id") % 10000).as("v"))
    val tQ = t0()
    val dcmRows = Sketches.dyadicCmQuantiles(vals, "v", width = dWidth)
      .collect()
    val dcmSec = secs(tQ)
    val dcmWorst = dcmRows.map { r =>
      val phi = r.getAs[Long]("phi_ppm")
      val qe = r.getAs[Long]("q_exact")
      val qb = r.getAs[Long]("q_est")
      assert(qe == phi / 100 - 1,
        s"planting broken: phi=$phi q_exact=$qe != ${phi / 100 - 1}")
      assert(r.getAs[Boolean]("est_le_exact"),
        s"one-sidedness broken at phi=$phi")
      (qe - qb).toDouble / qe.toDouble
    }.max
    assert(dcmWorst <= 0.02,
      f"dyadic-CM quantile off: worst early-shift $dcmWorst%.4f > 2%%")

    println(s"""{"n":$n,"hll_groups":$g,"hll_planted_distinct":$truth,""" +
      s""""hll_sec":$hllSec,"hll_register_rows":$nRegs,""" +
      s""""hll_worst_rel_err":$worstRelErr,""" +
      s""""hll_bound":${Sketches.HllBound},""" +
      s""""exact_distinct_sec":$exactSec,""" +
      s""""cm_sec":$cmSec,"cm_candidates":$nCand,""" +
      s""""cm_true_heavy":${trueHeavy.length},""" +
      s""""cm_false_heavy":${falseHeavy.length},""" +
      s""""kmv_k":$kmvK,"kmv_planted_inter":$overlap,""" +
      s""""kmv_gated_rows":${gated.count()},""" +
      s""""kmv_estimate":$kmvEst,"kmv_rel_err":$kmvRelErr,""" +
      s""""kmv_sec":$kmvSec,""" +
      s""""dcm_width":$dWidth,"dcm_sec":$dcmSec,""" +
      s""""dcm_worst_early_shift":$dcmWorst}""")
    spark.stop()
  }
}
