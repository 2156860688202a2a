package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar/analytic scoring primitives (SURVEY M2, M4, A13, A14). */
object Scoring {

  /** Cosine distance 1 − u·v/(‖u‖‖v‖) between two array columns
    * (SURVEY M2, `/root/reference/AA-AR.py:240` scipy.spatial.distance
    * .cosine). Pure higher-order-function expression — stays inside
    * whole-stage codegen, no UDF.
    */
  def cosineDistance(u: Column, v: Column): Column =
    lit(1.0) - dotProduct(u, v) / (l2Norm(u) * l2Norm(v))

  def dotProduct(u: Column, v: Column): Column =
    aggregate(zip_with(u, v, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)

  def l2Norm(u: Column): Column =
    sqrt(aggregate(u, lit(0.0), (acc, x) => acc + x * x))

  /** u·v / (‖u‖‖v‖) — native codegen expression (one fused loop per pair,
    * no intermediate arrays; see o.a.s.sql.graft.ArrayCosineSimilarityExpr).
    * Bit-identical to `dotProduct(u,v) / (l2Norm(u) * l2Norm(v))` on
    * well-formed input; this is the hot inner op of brute-force top-k.
    */
  def cosineSimilarity(u: Column, v: Column): Column =
    org.apache.spark.sql.graft.GraftExprBridge.cosineSimilarity(u, v)

  /** Power-law fit y = e^b · x^a on log-log axes + R² (SURVEY M4,
    * `AA-AR.py:188-193` sklearn LinearRegression + r2_score), as CLOSED-FORM
    * aggregates — OLS on one regressor is exactly:
    *   a  = covar_pop(ln x, ln y) / var_pop(ln x)
    *   b  = avg(ln y) − a · avg(ln x)
    *   R² = corr(ln x, ln y)²   (for simple OLS, R² = r²)
    * One aggregation pass, no iterative solver, embarrassingly parallel.
    * Inputs are shifted by +1 first, matching `AA-AR.py:179`.
    */
  def powerlawFit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val lx = log(col(xCol) + lit(1.0))
    val ly = log(col(yCol) + lit(1.0))
    df.agg(
      (covar_pop(lx, ly) / var_pop(lx)).as("slope"),
      (avg(ly) - covar_pop(lx, ly) / var_pop(lx) * avg(lx)).as("intercept"),
      (corr(lx, ly) * corr(lx, ly)).as("r2"),
      count(lit(1)).as("n"))
  }

  /** Power-of-2 log-binned means (SURVEY A13, `AA-AR.py:182-185`):
    * np.digitize(x, [2^0..2^k], right=True) on x ≥ 1 assigns x to bin
    * ⌈log2 x⌉ (with x = 1 → bin 0); per-bin mean of y. The reference first
    * shifts x by +1 (`AA-AR.py:179`); callers pass the shifted column.
    */
  def logBinnedMeans(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.withColumn("bin",
        ceil(log(2.0, col(xCol).cast("double"))).cast("bigint"))
      .groupBy(col("bin"))
      .agg(avg(col(yCol)).as("mean_y"), count(lit(1)).as("n"))

  /** argmax as an aggregation (SURVEY A14): id of the row maximizing
    * `value`, ties broken by smallest id for determinism (`max_by` alone is
    * nondeterministic under ties).
    */
  def argmax(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    df.orderBy(col(valueCol).desc, col(idCol).asc).limit(1)
}
