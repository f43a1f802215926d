package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 wraps Columns in
  * ColumnNodes, and the only supported way to lift a custom Catalyst
  * `Expression` into the Column API is this internal helper — the standard
  * pattern for Catalyst extension libraries (a file in the
  * `org.apache.spark.sql` package to satisfy the `private[sql]` scope).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a Catalyst expression builder
    * on an already-running session (the extensions path needs the config
    * set before the SparkContext exists; this is the runtime equivalent).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Exact integer division column (SQL `div`). The Column API's `/` on
    * longs is double division; exact-integer rounding (portable across
    * engines, unlike double round() tie behavior) needs the integral form.
    */
  def integralDivide(a: Column, b: Column): Column =
    column(catalyst.expressions.IntegralDivide(
      expression(a), expression(b), catalyst.expressions.EvalMode.LEGACY))

  /** Analyzed logical plan of a DataFrame (custom logical operators are
    * built over already-analyzed children, so they construct resolved).
    */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  // registration lock: extraStrategies/extraOptimizations are plain vars,
  // so the contains/append pair below is check-then-act — two threads
  // racing the first registration would otherwise both append
  private val registrationLock = new Object

  /** Idempotently add a planner strategy to a running session (the runtime
    * equivalent of SparkSessionExtensions.injectPlannerStrategy).
    */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit =
    registrationLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(s))
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ s
    }

  /** Idempotently add an optimizer rule to a running session (the runtime
    * equivalent of SparkSessionExtensions.injectOptimizerRule).
    */
  def addOptimizerRule(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit =
    registrationLock.synchronized {
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ r
    }
}
