/* Lives under org.apache.spark.sql to access the private[sql] Catalyst
 * surface — the standard pattern for out-of-tree native expressions.
 * Public API is graft.ext.SimSearch (via GraftExprBridge).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid cell assignment `argmin_j Σ_i (v_i − c_j_i)²` over a
  * literal centroid table, as a native codegen expression — the hot loop
  * of IVF index builds (evaluated once per corpus vector ×
  * nlist centroids × dim). The higher-order-function formulation
  * (an array of per-centroid zip_with/aggregate folds, then
  * array_position(array_min)) is interpreted per element and allocates a
  * zipped array per centroid per row; this is one fused loop over a
  * shared reference to the centroid matrix. Measured at 1M × 64 × 125
  * (AnnScale, local[32]): the HOF assignment runs the index build in
  * 48 s, the fused loop in 1.2 s.
  *
  * Semantics match the HOF formulation exactly on well-formed input:
  * per-centroid distances accumulate left-to-right from 0.0, and ties
  * keep the FIRST minimal index (array_position returns the first
  * match; the strict `<` comparison here does the same). Null vector,
  * null element, or a length that doesn't match the centroid dim →
  * null.
  *
  * `returnDist = true` returns the minimal squared distance itself
  * (double) instead of the argmin — the `array_min(ds)` companion
  * SemDeDup's keep-farthest rule needs alongside the cell; same loop,
  * same accumulation order, so the distances are the bit-identical
  * doubles the q69 mirror replays.
  *
  * `returnBoth = true` returns BOTH as a struct<cell int, d2c double> —
  * a consumer needing cell AND distance (SemDeDup) extracts two fields
  * of ONE shared subexpression, and whole-stage codegen's common-
  * subexpression elimination runs the O(nlist × dim) loop once per row;
  * two sibling expressions (one per flag) are NOT common subexpressions
  * and each pay the full scan.
  */
case class NearestCellExpr(child: Expression,
                           centers: Array[Array[Double]],
                           returnDist: Boolean = false,
                           returnBoth: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    if (returnBoth)
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", IntegerType,
          nullable = false),
        org.apache.spark.sql.types.StructField("d2c", DoubleType,
          nullable = false)))
    else if (returnDist) DoubleType
    else IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (centers.isEmpty || n != centers(0).length) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = v.getDouble(i); i += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      var s = 0.0
      var t = 0
      while (t < n) { val d = x(t) - c(t); s += d * d; t += 1 }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    if (returnBoth)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](best, bestD))
    else if (returnDist) java.lang.Double.valueOf(bestD)
    else java.lang.Integer.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centers", centers, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $v.numElements();
         |if ($cRef.length == 0 || $n != $cRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $x = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $x[$i] = $v.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $j = 0; $j < $cRef.length; $j++) {
         |      double[] $c = $cRef[$j];
         |      double $s = 0.0;
         |      for (int $t = 0; $t < $n; $t++) {
         |        double $d = $x[$t] - $c[$t];
         |        $s += $d * $d;
         |      }
         |      if ($s < $bestD) { $bestD = $s; $best = $j; }
         |    }
         |    ${ev.value} = ${
                if (returnBoth)
                  "new org.apache.spark.sql.catalyst.expressions." +
                    s"GenericInternalRow(new Object[]{" +
                    s"java.lang.Integer.valueOf($best), " +
                    s"java.lang.Double.valueOf($bestD)})"
                else if (returnDist) bestD else best};
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCellExpr = copy(child = newChild)
}
