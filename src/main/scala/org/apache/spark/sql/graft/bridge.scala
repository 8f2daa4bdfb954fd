package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst `Expression` to a user-facing `Column`.
  *
  * Spark 4 moved this conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils.column`); custom-expression
  * libraries conventionally reach it from a sub-package of
  * `org.apache.spark.sql`. The SQL-side registration path
  * ([[graft.GraftExtensions]]) complements this for `spark.sql(...)` users.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an EXISTING session (the extensions path
    * only reaches sessions built with `spark.sql.extensions`). The
    * function registry is `private[sql]` in Spark 4, hence this bridge
    * method.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** Whether the session's CacheManager holds any cached plan — the
    * observable for cache-release specs (the manager is `private[sql]`
    * in Spark 4; `SparkContext.getPersistentRDDs` does not see Dataset
    * caches until their blocks register, so it cannot pin release
    * semantics).
    */
  def anyPlanCached(spark: org.apache.spark.sql.SparkSession): Boolean =
    !spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
