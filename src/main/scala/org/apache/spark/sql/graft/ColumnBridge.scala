package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. Spark 4 removed the public
  * `new Column(expr)` constructor; the supported converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — so this one-file shim sits inside the sql package
  * tree (the conventional pattern for Spark extension libraries that
  * ship custom Catalyst expressions with a typed Column API; the
  * alternative, per-session FunctionRegistry registration, works too
  * and is what GraftFunctions offers for SQL-text callers).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** DataFrame <-> LogicalPlan bridge for custom logical operators
  * (same rationale as ColumnBridge: `Dataset.ofRows` and
  * `queryExecution.analyzed` are the supported internals, scoped
  * `private[sql]`). */
object DatasetBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
