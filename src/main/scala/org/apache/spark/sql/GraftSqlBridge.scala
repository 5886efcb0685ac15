package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction, so graft's custom
  * logical operators can be wrapped back into a DataFrame. Lives in the
  * org.apache.spark.sql package for access, contains no Spark-internal
  * logic of its own.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Column ↔ Expression, so session-free helpers (e.g.
    * TextFns.normalize) can wrap custom expressions without the
    * function registry (which is per-session and not guaranteed
    * installed at every call site).
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
