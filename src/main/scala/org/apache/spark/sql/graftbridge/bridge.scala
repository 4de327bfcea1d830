package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSession}

/** Minimal bridge into `private[sql]` API: converting between Column and
  * Catalyst Expression is package-private in Spark 4's classic module, and
  * custom native expressions (graft.functions.CosineSim) need both
  * directions; custom logical plans (graft.plans.AsOfJoin) additionally
  * need plan ↔ DataFrame. This is the entire private-API surface the
  * library touches.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed

  /** Block (bounded) until queued listener events are delivered — so a
    * bench's per-run shuffle-byte deltas include the run's own trailing
    * stage completions. `listenerBus` is private[spark]; this is the
    * same minimal-bridge justification as the Column/Expression pair.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
      timeoutMs: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
