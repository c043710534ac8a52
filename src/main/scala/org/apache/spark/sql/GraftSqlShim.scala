package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin bridge to two `private[sql]` entry points the script dialect
  * needs (the standard pattern for Spark extensions that execute a
  * hand-transformed LogicalPlan):
  *
  *  - running a PARSED-and-rewritten plan (graft.cli.SqliteArith
  *    rewrites `+ - * / %` into SQLite dynamic arithmetic BEFORE
  *    analysis, so it must hand Spark a LogicalPlan, not SQL text);
  *  - wrapping a rewritten catalyst Expression as a user-facing
  *    Column (the Column constructor takes ColumnNodes only).
  *
  * Nothing else from the private surface is exposed.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
