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

  /** Block until the shared listener bus has delivered every queued event
    * (`LiveListenerBus.waitUntilEmpty` is `private[spark]`). Streaming
    * query progress events ride this bus asynchronously; the scale probe's
    * state-rows listener must see the final batches of a finished query
    * before its buffer is read.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
