package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** The narrowest possible bridge into Spark's `private[sql]` surface,
  * in the style every Spark storage connector uses (Delta Lake keeps
  * its classes under `org.apache.spark.sql.delta` for exactly this):
  * a custom v1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * must hand `MicroBatchExecution` a DataFrame whose logical plan is
  * flagged `isStreaming = true`, and the only constructor for that is
  * `Dataset.ofRows`, which is `private[sql]`. Nothing else is
  * accessed through this object.
  */
object GraftSqlShims {

  /** DataFrame over an arbitrary logical plan (used with
    * `LogicalRelation(..., isStreaming = true)` by graft's streaming
    * sources).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
