package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the package-private Column<->Expression converters — the
  * standard pattern for libraries adding custom Catalyst expressions
  * (cf. SNIPPETS.md [2]/[3]: public Spark-extension projects place a
  * one-file shim in org.apache.spark.sql for exactly this).
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Inject a function into a LIVE session's registry (sessionState is
    * private[sql]; `spark.sql.extensions` only applies at session build).
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
