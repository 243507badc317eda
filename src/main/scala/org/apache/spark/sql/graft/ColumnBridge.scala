package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * `ExpressionUtils` is `private[sql]`, so the bridge lives in an
  * `org.apache.spark.sql` subpackage — the standard pattern for Spark
  * extension libraries that register custom expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an EXISTING session (`sessionState` is
    * `private[sql]`, hence this bridge). The SparkSessionExtensions path
    * (`graft.GraftExtensions`) covers sessions built with
    * `spark.sql.extensions`; this covers sessions already running. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
}
