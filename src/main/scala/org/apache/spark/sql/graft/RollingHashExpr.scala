/* Lives under org.apache.spark.sql to access the private[sql] Catalyst
 * surface (AbstractDataType, ExpressionUtils) — the standard pattern for
 * out-of-tree native expressions. Public API is graft.functions.RollingHash.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * h ← h·31 + byte, wrapping in Long. Document-fingerprinting primitive
  * (Rabin–Karp style), implemented as a native Catalyst Expression WITH
  * codegen (`doGenCode`) so it stays inside the whole-stage-generated loop —
  * a Scala UDF here would box every row and break codegen.
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

/** Column ↔ Expression bridge for graft code outside the sql package. */
object GraftExprBridge {
  def rollingHash(c: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c)))

  def cosineSimilarity(u: Column, v: Column): Column =
    ExpressionUtils.column(ArrayCosineSimilarityExpr(
      ExpressionUtils.expression(u), ExpressionUtils.expression(v)))

  def nearestCell(v: Column, centers: Array[Array[Double]]): Column =
    ExpressionUtils.column(NearestCellExpr(
      ExpressionUtils.expression(v), centers))

  def nearestCellDist(v: Column, centers: Array[Array[Double]]): Column =
    ExpressionUtils.column(NearestCellExpr(
      ExpressionUtils.expression(v), centers, returnDist = true))

  def nearestCellBoth(v: Column, centers: Array[Array[Double]]): Column =
    ExpressionUtils.column(NearestCellExpr(
      ExpressionUtils.expression(v), centers, returnBoth = true))

  def md5Halves(c: Column): Column =
    ExpressionUtils.column(Md5HalvesExpr(ExpressionUtils.expression(c)))

  def md5Ppm(c: Column): Column =
    ExpressionUtils.column(Md5PpmExpr(ExpressionUtils.expression(c)))

  /** Variable-distance shift left (Catalyst ShiftLeft) — the
    * `functions.shiftleft` API only takes a constant distance; the Bloom
    * probe's bit masks need `1L << (pos mod 32)` per row.
    */
  def shiftLeftVar(base: Column, bits: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        ExpressionUtils.expression(base),
        ExpressionUtils.expression(bits)))
}
