package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column ↔ Expression conversion.
  *
  * Spark 4 moved `Column(expr)` construction behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; third-party native
  * expressions (e.g. [[graft.functions.PointInPolygon]]) need exactly these
  * two hops and nothing else, so this object is the only code we place in
  * Spark's namespace.
  */
object bridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for composing custom logical
    * nodes, e.g. [[graft.plans.AsofJoin]]). */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame over a custom logical plan (`Dataset.ofRows` is
    * `private[sql]` in Spark 4). */
  def dfOf(spark: org.apache.spark.sql.SparkSession,
           plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
