package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  val featureCols: Seq[String] = Seq(
    "unique_in_degree", "multi_in_degree",
    "unique_out_degree", "multi_out_degree",
    "total_in_weight", "mean_in_weight", "median_in_weight", "var_in_weight",
    "total_out_weight", "mean_out_weight", "median_out_weight",
    "var_out_weight")

  /** Population variance from exact integer sums: deterministic IEEE
    * arithmetic (bit-identical to the same expression in any engine),
    * unlike streaming var_pop whose merge order varies with partitioning.
    */
  private def varPopClosed(w: Column): Column = {
    val n = count(lit(1)).cast("double")
    val s = sum(w).cast("double")
    val s2 = sum(w * w).cast("double")
    (s2 - s * s / n) / n
  }

  private def sideAgg(edges: DataFrame, keyCol: String, otherCol: String,
                      pfx: String): DataFrame =
    edges.groupBy(col(keyCol).as("account")).agg(
      countDistinct(col(otherCol)).as(s"unique_${pfx}_degree"),
      count(lit(1)).as(s"multi_${pfx}_degree"),
      sum(col("weight")).as(s"total_${pfx}_weight"),
      (sum(col("weight")).cast("double") / count(lit(1)))
        .as(s"mean_${pfx}_weight"),
      percentile(col("weight"), lit(0.5)).as(s"median_${pfx}_weight"),
      varPopClosed(col("weight")).as(s"var_${pfx}_weight"))

  /** 12 features per account over an edge set (columns src/dst/weight).
    * Node universe = union of both endpoints (SURVEY O1, `AA-AR.py:40`).
    */
  def accountFeatures(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("account"))
      .union(edges.select(col("dst").as("account"))).distinct()
    val ins = sideAgg(edges, "dst", "src", "in")
    val outs = sideAgg(edges, "src", "dst", "out")
    val joined = nodes
      .join(ins, Seq("account"), "left")
      .join(outs, Seq("account"), "left")
    val filled = featureCols.map { c =>
      val zero: Column =
        if (c.startsWith("mean") || c.startsWith("median") ||
            c.startsWith("var")) lit(0.0)
        else lit(0L)
      coalesce(col(c), zero).as(c)
    }
    joined.select(col("account") +: filled: _*)
  }

  /** Windowed variant: `edges` must already carry a `wid` column
    * (Windows.withWindowId); features are computed per (wid, account).
    */
  def accountFeaturesByWindow(edgesW: DataFrame): DataFrame = {
    val nodes = edgesW.select(col("wid"), col("src").as("account"))
      .union(edgesW.select(col("wid"), col("dst").as("account"))).distinct()
    def side(keyCol: String, otherCol: String, pfx: String): DataFrame =
      edgesW.groupBy(col("wid"), col(keyCol).as("account")).agg(
        countDistinct(col(otherCol)).as(s"unique_${pfx}_degree"),
        count(lit(1)).as(s"multi_${pfx}_degree"),
        sum(col("weight")).as(s"total_${pfx}_weight"),
        (sum(col("weight")).cast("double") / count(lit(1)))
          .as(s"mean_${pfx}_weight"),
        percentile(col("weight"), lit(0.5)).as(s"median_${pfx}_weight"),
        varPopClosed(col("weight")).as(s"var_${pfx}_weight"))
    val joined = nodes
      .join(side("dst", "src", "in"), Seq("wid", "account"), "left")
      .join(side("src", "dst", "out"), Seq("wid", "account"), "left")
    val filled = featureCols.map { c =>
      val zero: Column =
        if (c.startsWith("mean") || c.startsWith("median") ||
            c.startsWith("var")) lit(0.0)
        else lit(0L)
      coalesce(col(c), zero).as(c)
    }
    joined.select(col("wid") +: col("account") +: filled: _*)
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
