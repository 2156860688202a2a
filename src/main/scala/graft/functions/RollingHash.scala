package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftExprBridge

/** Public Column API for the native rolling-hash Catalyst expression
  * (implementation: org.apache.spark.sql.graft.RollingHashExpr — lives in
  * the sql package to reach the private[sql] Expression surface).
  *
  * Document fingerprinting primitive for the training-data-pipeline
  * extension surface (SURVEY §7.5).
  */
object RollingHash {
  def rolling_hash(c: Column): Column = GraftExprBridge.rollingHash(c)
}
