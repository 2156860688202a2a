/* Lives under org.apache.spark.sql to access the private[sql] Catalyst
 * surface (AbstractDataType, ExpressionUtils) — the standard pattern for
 * out-of-tree native expressions. Public API is graft.functions.VectorOps.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Cosine similarity u·v / (‖u‖‖v‖) over two array<double> columns as a
  * native Catalyst expression with codegen — the hot inner operation of
  * the similarity-search family (brute-force top-k evaluates it
  * |corpus| × |queries| times). The higher-order-function formulation
  * (zip_with + aggregate, 3 passes) allocates a zipped array per pair and
  * evaluates a lambda per element; this is one fused loop, no allocation.
  *
  * Semantics match the HOF formulation bit-for-bit on well-formed input
  * (same left-to-right accumulation order): null if either array is null,
  * any element is null, or lengths differ (zip_with pads with null, which
  * nulls the whole fold). Divergence: a zero-norm input yields IEEE
  * Inf/NaN here where ANSI division raises DIVIDE_BY_ZERO — the lenient
  * behaviour is what similarity pipelines want for degenerate vectors.
  */
case class ArrayCosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(uAny: Any, vAny: Any): Any = {
    val u = uAny.asInstanceOf[ArrayData]
    val v = vAny.asInstanceOf[ArrayData]
    val n = u.numElements()
    if (n != v.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (u.isNullAt(i) || v.isNullAt(i)) return null
      val x = u.getDouble(i)
      val y = v.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, v) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $u.numElements();
         |if ($n != $v.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($u.isNullAt($i) || $v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $u.getDouble($i);
         |    double $y = $v.getDouble($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}
