package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters so the
  * engine's custom Catalyst expressions (graft.functions) can expose a
  * public Column API. Lives in org.apache.spark.sql purely for access;
  * contains no logic. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `private[sql]` access for the bench harness's between-query
    * streaming-state reap (GraftBenchInternals.cleanStreamingState):
    * close and unregister every loaded state-store provider. The next
    * streaming query reloads its state from checkpoint as usual. */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
