package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ArrayCosineSimilarityExpr, RollingHashExpr}

/** SparkSessionExtensions installer: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql(...)` users get
  * them too (not only the Column API):
  *
  *   spark.sql("SELECT rolling_hash(text) FROM docs")
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  *
  * Activate with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via `SparkSession.builder.withExtensions`.
  * No custom Rule/Strategy is installed — SURVEY §4: every operator
  * lowers to built-in Catalyst operators, so there is nothing for a
  * custom optimizer rule to do that Catalyst doesn't already.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[ArrayCosineSimilarityExpr].getName,
        "cosine_sim"),
      (children: Seq[Expression]) =>
        ArrayCosineSimilarityExpr(children(0), children(1))))
  }
}
