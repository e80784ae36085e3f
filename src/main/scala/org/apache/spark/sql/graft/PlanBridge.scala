package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge between the public `DataFrame` API and Catalyst `LogicalPlan`s.
  *
  * Constructing a Dataset over a CUSTOM logical node (graft's
  * [[graft.plans.AsOfJoin]]) needs `Dataset.ofRows`, and extracting the
  * analyzed plan of an existing frame needs `queryExecution` internals —
  * both `private[sql]`, hence this shim under the `org.apache.spark.sql`
  * package (same pattern as [[ColumnBridge]]). Only public-Spark
  * internals are touched.
  */
object PlanBridge {

  /** The analyzed logical plan of a DataFrame (stable attribute ids). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** A DataFrame over an arbitrary (already resolved) logical plan. */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently install an extra planner strategy on a LIVE session —
    * the path for sessions graft did not build (the driver's), where
    * `spark.sql.extensions` was not set. Extension-built sessions get the
    * same strategies via [[graft.GraftExtensions]]. */
  def ensureStrategy(s: SparkSession, strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = s.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
