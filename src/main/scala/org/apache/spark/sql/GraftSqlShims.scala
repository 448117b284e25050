package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private Spark APIs needed to wrap custom Catalyst
  * expressions as user-facing Columns in Spark 4 (where Column holds
  * a ColumnNode rather than an Expression). The usual extension-point
  * idiom: a shim object placed in the org.apache.spark.sql package.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's function registry (private[sql] via sessionState) —
    * lets GraftExtensions.install register functions into an
    * already-built session (shells, shared test sessions).
    */
  def functionRegistry(spark: SparkSession): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
