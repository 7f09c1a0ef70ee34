package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions — the standard
  * pattern for libraries that ship custom Catalyst expressions (the public
  * Column API is backend-agnostic in Spark 4, so direct construction lives
  * behind `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression tree.
    * `expression` wraps lazily (a `ColumnNodeExpression`), which is fine
    * inside Dataset operations but NOT for FunctionRegistry builders — the
    * analyzer never unwraps it there and codegen fails. This runs the real
    * converter, yielding ordinary (possibly unresolved) Catalyst nodes the
    * analyzer then resolves like any SQL function body.
    */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the injection point for library-defined logical
    * operators (graft.plans.*): build the node over [[analyzedPlan]],
    * hand it back to the session, and the analyzer resolves the node's
    * expressions like any built-in operator's.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan a library operator composes over. */
  def analyzedPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Idempotently register a physical strategy on the session
    * (`experimental.extraStrategies` — the per-session injection point
    * that needs no SparkSessionExtensions wiring at session-build time,
    * so library operators work on a caller's existing session).
    */
  def registerStrategy(spark: SparkSession,
                       s: org.apache.spark.sql.execution.SparkStrategy): Unit =
    synchronized {
      val cls = spark.asInstanceOf[classic.SparkSession]
      if (!cls.experimental.extraStrategies.contains(s)) {
        cls.experimental.extraStrategies = cls.experimental.extraStrategies :+ s
      }
    }

  /** Eagerly convert a Column to a catalyst SortOrder (wrapping a bare
    * expression ascending, the SQL default).
    */
  def sortOrderOf(c: Column): org.apache.spark.sql.catalyst.expressions.SortOrder =
    convertedExpression(c) match {
      case s: org.apache.spark.sql.catalyst.expressions.SortOrder => s
      case e => org.apache.spark.sql.catalyst.expressions.SortOrder(
        e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }

  /** Block until the shared listener bus has delivered every queued event
    * (`LiveListenerBus.waitUntilEmpty` is `private[spark]`). Streaming
    * query progress events ride this bus asynchronously; the scale probe's
    * state-rows listener must see the final batches of a finished query
    * before its buffer is read.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
