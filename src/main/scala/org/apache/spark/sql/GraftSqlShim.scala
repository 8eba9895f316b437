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

  /** Drop the cached blocks of a `localCheckpoint()`ed Dataset the caller
    * has finished with (iterative ops supersede one checkpoint with the
    * next; without this every round's blocks stay resident for the life of
    * the session — storage-memory pressure that surfaces as eviction/GC
    * churn in long bench runs). The blocks are unrecoverable afterwards —
    * only call once nothing will read the Dataset again. No-op for
    * non-localCheckpoint plans (reliable checkpoints are files, not
    * blocks).
    */
  def dropLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
