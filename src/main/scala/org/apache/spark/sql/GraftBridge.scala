package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries adding native Catalyst expressions
  * (the classic-session equivalents of what `spark.sql.extensions`
  * function injection uses internally).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom logical plan into a DataFrame (Dataset.ofRows). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a 1-row/1-col DataFrame as a scalar-subquery expression — the
    * construction Spark's own InjectRuntimeFilter uses to hand a
    * driver-computed sketch (e.g. a bloom filter) to executor-side
    * predicates as a constant.
    */
  def scalarSubquery(df: DataFrame): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed))

  /** Register a native function into an EXISTING session's registry (the
    * runtime equivalent of `SparkSessionExtensions.injectFunction`).
    */
  def registerFunction(spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        info, builder)
}
