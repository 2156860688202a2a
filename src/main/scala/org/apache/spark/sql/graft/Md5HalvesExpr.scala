/* Lives under org.apache.spark.sql for the same reason as RollingHashExpr:
 * access to the private[sql] Catalyst bridge. Public API is
 * GraftExprBridge.md5Halves.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo's md5 two-half idiom — h1 = hex digits 1–7, h2 = digits 8–14
  * of the digest, the Kirsch–Mitzenmacher bases of the MinHash family —
  * computed NATIVELY: one digest over the UTF-8 bytes, both 28-bit halves
  * read straight out of its first 8 bytes, packed into one long as
  * (h1 << 28) | h2. Bit-identical to the composed form
  * `conv(substring(md5(s), 1, 7), 16, 10)` / `...(8, 7)...` that the
  * DuckDB oracles mirror, so swapping it into a plan changes nothing a
  * hash-check can see.
  *
  * Why native: the composed form evaluates md5 TWICE per row (once per
  * half — CollapseProject inlines the shared digest) and then round-trips
  * through a 32-char hex string, two substrings, and two string-parse
  * base conversions. One digest + two shifts cuts the hashing pass of the
  * 24.5M-shingle 200k-doc probe from 3.6 s to 2.3 s (the shingle scan it
  * rides was itself the hottest loop until wordNgrams went zip_with), and
  * the generated code stays inside whole-stage codegen: a single static
  * call producing a long.
  */
case class Md5HalvesExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Md5Halves.pack(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Md5Halves.pack($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5HalvesExpr =
    copy(child = newChild)
}

/** The ppm-coin sibling: `conv(substring(md5(s), 1, 15), 16, 10) %
  * 1000000` — the repo's derandomized-sampling idiom
  * ([[graft.ext.Splits.ppmCoin]]) — as one native digest: the first 15
  * hex digits are the top 60 bits of the digest's first 8 bytes, so the
  * whole composition is one shift and one modulo. Bit-identical to the
  * composed form every sampling oracle mirrors.
  */
case class Md5PpmExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Md5Halves.ppm(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Md5Halves.ppm($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5PpmExpr =
    copy(child = newChild)
}

object Md5Halves {
  // MessageDigest is stateful and not thread-safe; getInstance per row
  // would dominate the loop. digest() resets the instance, so one
  // per-thread digest serves every row of a task.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def first8BigEndian(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l
  }

  /** (hex digits 1–7 of md5) << 28 | (hex digits 8–14). */
  def pack(bytes: Array[Byte]): Long = {
    // first 8 digest bytes, big-endian — hex digits 1–16 of the string form
    val l = first8BigEndian(bytes)
    val h1 = l >>> 36            // top 28 bits  = hex digits 1–7
    val h2 = (l >>> 8) & 0xfffffffL // bits 28–56 = hex digits 8–14
    (h1 << 28) | h2
  }

  /** (hex digits 1–15 of md5, an unsigned 60-bit value) mod 10⁶. */
  def ppm(bytes: Array[Byte]): Long =
    (first8BigEndian(bytes) >>> 4) % 1000000L
}
