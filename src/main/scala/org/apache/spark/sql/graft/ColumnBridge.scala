package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters —
  * the standard extension-library pattern (Delta/Iceberg declare the
  * same kind of shim inside `org.apache.spark.sql`): graft's column
  * mapping needs to rewrite attribute NAMES inside a user predicate
  * (logical → physical) before analysis, which requires the
  * pre-analysis expression tree of a `Column` and a way back.
  * Nothing else in the engine touches non-public Spark API.
  */
/** Bridge for streaming `Sink.addBatch` implementations: re-root the
  * micro-batch DataFrame onto its already-planned RDD as a
  * NON-streaming plan — the exact pattern Spark's own
  * `ForeachBatchSink` (and Delta's sink) use, because handing the
  * incremental plan to a batch writer would fail analysis
  * ("streaming sources must be executed with writeStream.start()").
  */
object DatasetBridge {
  def asBatch(data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, node)
  }
}

object ColumnBridge {
  /** The FULLY-CONVERTED catalyst expression tree of a Column (a
    * plain `ExpressionUtils.expression` returns a lazy
    * `ColumnNodeExpression` leaf whose internals a catalyst
    * `transform` cannot reach).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  def column(e: Expression): Column = ExpressionUtils.column(e)
}
