package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column onto ColumnNode and made the Expression<->Column
  * conversions private[sql]. This bridge lives inside the
  * org.apache.spark.sql namespace (the standard pattern for Spark
  * extension libraries) to expose exactly the two conversions custom
  * Catalyst expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** LogicalPlan → DataFrame on an existing session (private[sql] in
    * Spark 4) — the FenceProbe plan-rewrite sweep needs it to execute
    * a guarded copy of an analyzed plan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotent function registration on an EXISTING session — needed
    * because SparkSessionExtensions only bind at session construction,
    * and getOrCreate may hand back a session built elsewhere. */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
