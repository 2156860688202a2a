package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 12-feature per-account aggregation (SURVEY A1-A8).
  *
  * `generate_features` (`/root/reference/AA-AR.py:39-66`) loops per account
  * and filters the frame twice per account — an O(n_accounts · |E|) manual
  * group-by. Here it is two shuffle aggregations (one keyed by dst for the
  * in-side, one by src for the out-side) + a join on the node universe:
  * O(|E|) with map-side partial aggregation, the shape that survives 100 TB.
  *
  * numpy-semantics pinning (SURVEY §5):
  *   - variance is population variance (`np.var`, ddof=0) → closed form
  *     E[w²] − E[w]² computed from exact integer sums, NOT var_samp;
  *   - median is the interpolating midpoint (`np.median`) → exact
  *     `percentile`, NOT percentile_approx;
  *   - an account with no in- (or out-) edges gets 0 for every stat
  *     (`AA-AR.py:34-35`) → left joins from the node universe + coalesce.
  */
object Features {

  /** percentile_approx sketch accuracy for the approximate feature mode:
    * groups up to this size are in the sketch's EXACT regime (the q62
    * ok_median_* 2× flag bound is a theorem there, empirical beyond).
    */
  val ApproxMedianAccuracy: Int = 10000

  val featureCols: Seq[String] = Seq(
    "unique_in_degree", "multi_in_degree",
    "unique_out_degree", "multi_out_degree",
    "total_in_weight", "mean_in_weight", "median_in_weight", "var_in_weight",
    "total_out_weight", "mean_out_weight", "median_out_weight",
    "var_out_weight")

  /** Single-pass conditional aggregation over both edge sides: each edge
    * contributes one out-side row (account = src) and one in-side row
    * (account = dst); every stat is a null-skipping conditional aggregate
    * of ONE groupBy. This replaces the naive two-aggregations + node-
    * universe + two-left-joins plan (4 shuffles) with exactly one shuffle
    * keyed by the grouping columns, and the node universe (SURVEY O1,
    * `AA-AR.py:40,98`) falls out of the union for free. Accounts missing a
    * side get the reference's zero defaults (`AA-AR.py:34-35`) via
    * when/coalesce — the same values the oracle's LEFT JOIN + coalesce
    * produces.
    */
  private def onePass(edges: DataFrame, grpCols: Seq[String]): DataFrame = {
    val g = grpCols.map(col)
    val sides = edges
      .select(g :+ col("src").as("account") :+ lit(true).as("is_out") :+
        col("dst").as("other") :+ col("weight").as("weight"): _*)
      .union(edges
        .select(g :+ col("dst").as("account") :+ lit(false).as("is_out") :+
          col("src").as("other") :+ col("weight").as("weight"): _*))

    // Exact interpolating median WITHOUT the built-in `percentile`
    // aggregate: `Percentile` is an ObjectAggregate (per-group hashmap
    // buffers, no codegen, partial/final serialization) and was the single
    // most expensive term of this aggregation — ~8 s of a ~9 s stage at
    // sf0.1 vs ~1 s for everything else. Instead: rank weights within each
    // (group, account, side) by one sort-based window pass, keep the one or
    // two middle rows (rn = ⌊(cnt+1)/2⌋ and ⌊cnt/2⌋+1 coincide when cnt is
    // odd), and average them. avg of ≤ 2 bigints = lower + (upper−lower)/2
    // exactly (both exact in double), i.e. identical values to
    // percentile(w, 0.5) / numpy's np.median / DuckDB's quantile_cont —
    // the q05 oracle hash-checks this.
    //
    // Plan shape (the 100 TB rationale): ONE scan of `sides` feeds both
    // the stats and the median. The window partitions by the full
    // (group, account, is_out) side key, so the per-side aggregation that
    // follows reuses its partitioning (no second exchange), and grouping
    // BY is_out (instead of when(is_out, …) conditional distincts over a
    // two-sided group) keeps the aggregation at a single distinct column
    // — planned as a two-phase distinct aggregate, NOT the Expand ×3 row
    // blow-up that two conditional countDistincts force through the
    // shuffle. The sides then pivot (group, account, is_out) → one row
    // per (group, account) in a final cheap exchange of 12 packed
    // aggregates. Measured at sf0.1: 17.3 s (conditional-Expand shape) →
    // ~6 s. Everything is whole-stage codegen: a sort exchange, a window,
    // two hash aggs.
    val sideKey = g :+ col("account") :+ col("is_out")
    val pw = Window.partitionBy(sideKey: _*).orderBy(col("weight"))
    val nD = count(col("weight")).cast("double")
    val s = sum(col("weight")).cast("double")
    val s2 = sum(col("weight") * col("weight")).cast("double")
    val perSide = sides
      .withColumn("rn", row_number().over(pw))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(sideKey: _*)))
      .groupBy(sideKey: _*)
      .agg(
        countDistinct(col("other")).as("u"),
        count(col("weight")).as("n"),
        sum(col("weight")).as("tot"),
        (s / nD).as("mean"),
        ((s2 - s * s / nD) / nD).as("vr"),
        avg(when(col("rn") === expr("(cnt + 1) div 2") ||
          col("rn") === expr("cnt div 2 + 1"), col("weight"))).as("med"))

    // pivot the two side rows into the 12 feature columns; an account
    // missing a side gets the reference's zero defaults (AA-AR.py:34-35)
    def pick(isOut: Boolean, c: String): Column =
      max(when(col("is_out") === lit(isOut), col(c)))
    def side(isOut: Boolean, pfx: String): Seq[Column] = Seq(
      coalesce(pick(isOut, "u"), lit(0L)).as(s"unique_${pfx}_degree"),
      coalesce(pick(isOut, "n"), lit(0L)).as(s"multi_${pfx}_degree"),
      coalesce(pick(isOut, "tot"), lit(0L)).as(s"total_${pfx}_weight"),
      coalesce(pick(isOut, "mean"), lit(0.0)).as(s"mean_${pfx}_weight"),
      coalesce(pick(isOut, "med"), lit(0.0)).as(s"median_${pfx}_weight"),
      coalesce(pick(isOut, "vr"), lit(0.0)).as(s"var_${pfx}_weight"))
    val aggs = side(isOut = false, "in") ++ side(isOut = true, "out")
    val ordered = featureCols.map(col)
    perSide.groupBy(g :+ col("account"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(g ++ (col("account") +: ordered): _*)
  }

  /** 12 features per account over an edge set (columns src/dst/weight).
    * Node universe = union of both endpoints (SURVEY O1, `AA-AR.py:40`).
    */
  def accountFeatures(edges: DataFrame): DataFrame =
    onePass(edges, Seq.empty)

  /** Windowed variant: `edges` must already carry a `wid` column
    * (Windows.withWindowId); features are computed per (wid, account).
    */
  def accountFeaturesByWindow(edgesW: DataFrame): DataFrame =
    onePass(edgesW, Seq("wid"))

  /** APPROXIMATE mode (SURVEY §4's documented trade-off): the exact
    * per-group sort for the median and the Expand for exact distinct
    * counts are the two costs that grow with group size; at extreme group
    * cardinalities swap them for mergeable sketches —
    * `approx_count_distinct` (HyperLogLog++ at rsd 2% — 4096 registers,
    * whose linear-counting regime keeps small/mid cardinalities near-
    * exact; the default 5%'s small-range bias correction wobbled past
    * ±2 on single-digit groups, observed at sf0.1) and `percentile_approx`
    * (KLL-style). One ordinary hash aggregation, no sort, no Expand,
    * fixed-size partial state per group. Sketch values are NOT oracle-
    * comparable by construction; FeaturesSpec pins them to the exact
    * operator within tolerance, and the q62 face hash-checks the
    * documented error bounds as boolean flags.
    */
  def accountFeaturesApprox(edgesW: DataFrame,
                            grpCols: Seq[String] = Seq("wid")): DataFrame = {
    val g = grpCols.map(col)
    val sides = edgesW
      .select(g :+ col("src").as("account") :+ lit(true).as("is_out") :+
        col("dst").as("other") :+ col("weight").as("weight"): _*)
      .union(edgesW
        .select(g :+ col("dst").as("account") :+ lit(false).as("is_out") :+
          col("src").as("other") :+ col("weight").as("weight"): _*))
    def side(isOut: Boolean, pfx: String): Seq[Column] = {
      val cond = if (isOut) col("is_out") else !col("is_out")
      val w = when(cond, col("weight"))
      val n = count(w)
      val s = sum(w).cast("double")
      val s2 = sum(w * w).cast("double")
      Seq(
        approx_count_distinct(when(cond, col("other")), 0.02)
          .as(s"unique_${pfx}_degree"),
        n.as(s"multi_${pfx}_degree"),
        coalesce(sum(w), lit(0L)).as(s"total_${pfx}_weight"),
        when(n > 0, s / n.cast("double")).otherwise(lit(0.0))
          .as(s"mean_${pfx}_weight"),
        // accuracy pinned at ApproxMedianAccuracy: for group sizes up to
        // it the KLL sketch is in its EXACT regime — it returns one of
        // the two middle order statistics, so for non-negative weights
        // the returned element is within 2× of the interpolating median
        // ((b−a)/(a+b) ≤ 1), the bound q62's ok_median_* flags check.
        // Past that group size the rank-error guarantee (~1/accuracy)
        // takes over and the 2× value bound is empirical, not a theorem
        // — raise the accuracy with the max group size if a deployment
        // needs the flag contract at larger groups (state is
        // O(accuracy) doubles per group either way).
        coalesce(percentile_approx(w, lit(0.5), lit(ApproxMedianAccuracy))
          .cast("double"), lit(0.0)).as(s"median_${pfx}_weight"),
        when(n > 0, (s2 - s * s / n.cast("double")) / n.cast("double"))
          .otherwise(lit(0.0)).as(s"var_${pfx}_weight"))
    }
    val aggs = side(isOut = false, "in") ++ side(isOut = true, "out")
    sides.groupBy(g :+ col("account"): _*).agg(aggs.head, aggs.tail: _*)
      .select(g ++ (col("account") +: featureCols.map(col)): _*)
  }

  /** Per-window counts of feature PAIRS that are both non-zero on the same
    * account (SURVEY P6 — the focus stage's candidate mask). One row per
    * (wid, f1, f2) with f1 < f2.
    *
    * `feats` is one row per (wid, account) (the 12-feature table), so the
    * ordered pairs are generated MAP-SIDE per row: the 66 static index
    * pairs (i < j over 12 features) are a flat array of cheap
    * `when(cᵢ≠0 AND cⱼ≠0, struct(i, j))` terms over PLAIN column
    * references, null-filtered and exploded — and the only shuffle in
    * the whole operator is the final (wid, f1, f2) groupBy (tiny key
    * space). The previous shape self-joined the melted (wid, account,
    * fidx) table on (wid, account): two shuffles of corpus-scale melted
    * rows for the same answer (round-8 verdict cleanup #3). NOT a nested
    * transform-over-a-derived-array HOF: that form re-evaluates the
    * derived array expression per outer lambda element (the same
    * CollapseProject trap as the LSH signature — measured 2.5× SLOWER
    * than the join it replaced at sf0.1). Pinned single-shuffle in
    * PlanAuditSpec.
    */
  def pairNonzeroCounts(feats: DataFrame): DataFrame = {
    // Two-level shape (round 16): the previous draft exploded ≤66 pair
    // structs per feature ROW (~66× the input through the map-side hash
    // agg). A row's pair set is a pure function of its 12-bit non-zero
    // MASK, so aggregate rows down to (wid, mask) counts first — the
    // mask domain is ≤ 2¹², so this agg is map-side-combined to almost
    // nothing — and only then expand each distinct mask into its pairs,
    // summing the pre-aggregated counts. Value-identical by construction:
    // cnt(wid,f1,f2) = Σ_{masks with bits f1,f2} cnt(wid,mask).
    val cs = featureCols.map(c => col(c).cast("double"))
    val mask = cs.zipWithIndex.map { case (c, i) =>
      when(c =!= 0.0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val byMask = feats.select(col("wid"), mask.as("__m"))
      .groupBy(col("wid"), col("__m")).agg(count(lit(1)).as("__n"))
    val pairs = for {
      i <- featureCols.indices
      j <- featureCols.indices if i < j
    } yield when(
      col("__m").bitwiseAND(lit((1 << i) | (1 << j)))
        === lit((1 << i) | (1 << j)),
      struct(lit(i).as("f1"), lit(j).as("f2")))
    byMask.select(col("wid"), col("__n"),
        explode(filter(array(pairs: _*), x => x.isNotNull)).as("p"))
      .groupBy(col("wid"), col("p.f1").as("f1"), col("p.f2").as("f2"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /** DuckDB oracle SQL for the same aggregation, given an `edges` CTE
    * already in scope (optionally windowed: pass the grouping columns).
    * The expressions mirror the Spark side token-for-token so double
    * results hash-match.
    */
  def oracleSideSql(grpCols: Seq[String]): String = {
    val g = grpCols.map(c => s"$c, ").mkString
    val gb = (1 to (grpCols.size + 1)).mkString(", ")
    s"""ins AS (
       |  SELECT ${g}dst AS account,
       |    count(DISTINCT src) AS unique_in_degree,
       |    count(*) AS multi_in_degree,
       |    CAST(sum(weight) AS BIGINT) AS total_in_weight,
       |    CAST(sum(weight) AS DOUBLE) / count(*) AS mean_in_weight,
       |    quantile_cont(weight, 0.5) AS median_in_weight,
       |    (CAST(sum(weight*weight) AS DOUBLE) - CAST(sum(weight) AS DOUBLE) * CAST(sum(weight) AS DOUBLE) / count(*)) / count(*) AS var_in_weight
       |  FROM edges GROUP BY $gb),
       |outs AS (
       |  SELECT ${g}src AS account,
       |    count(DISTINCT dst) AS unique_out_degree,
       |    count(*) AS multi_out_degree,
       |    CAST(sum(weight) AS BIGINT) AS total_out_weight,
       |    CAST(sum(weight) AS DOUBLE) / count(*) AS mean_out_weight,
       |    quantile_cont(weight, 0.5) AS median_out_weight,
       |    (CAST(sum(weight*weight) AS DOUBLE) - CAST(sum(weight) AS DOUBLE) * CAST(sum(weight) AS DOUBLE) / count(*)) / count(*) AS var_out_weight
       |  FROM edges GROUP BY $gb)""".stripMargin
  }
}
