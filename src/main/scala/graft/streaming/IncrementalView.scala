package graft.streaming

import graft.sources.DataSkipping
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained grouped-aggregate view over a stats
  * table — the materialized-view-maintenance pattern the change data
  * feed exists for: at 100 TB, re-aggregating the base table after
  * every DML batch is the cost being avoided; folding the feed's
  * signed deltas into a small keyed view costs O(changes), not
  * O(table).
  *
  * The view is itself a stats table keyed on the group column, so
  * downstream reads prune on it and the merge arithmetic reuses the
  * storage layer's own MERGE. Maintenance is a change-feed stream
  * ([[ChangeFeedSource]]) drained with `Trigger.AvailableNow` into
  * `foreachBatch`: per batch, each change row contributes its value
  * with weight +1 (`insert` / `update_postimage`) or -1 (`delete` /
  * `update_preimage`), the per-group deltas join the view's CURRENT
  * rows for exactly the affected keys (pruned read), groups whose
  * count reaches zero are DELETEd from the view, and the rest MERGE
  * in. A group-key-changing UPDATE migrates between groups for free
  * — the preimage debits the old group, the postimage credits the
  * new one.
  *
  * Sums are DECIMAL (value cast to `(20,6)`, accumulated at
  * `(30,6)`): decimal arithmetic is exact and associative, so the
  * incrementally-maintained view is BIT-IDENTICAL to a full
  * recompute — a float sum would drift with fold order and make the
  * view unverifiable against its own definition.
  *
  * Exactly-once: the feed's version offsets live in `checkpoint`; a
  * maintenance run that crashes after folding but before the offset
  * commit replays the same immutable versions into the same MERGE —
  * re-running [[maintainSumCount]] with no new DML is a no-op. The
  * BOOTSTRAP aggregates the frozen snapshot `readSkippingAt(base,
  * V)` of the CURRENT version V and pins the feed at `V + 1`
  * (version boundaries make "exactly the changes after the
  * snapshot" well-defined — no double-count window even if DML
  * lands mid-bootstrap). Single maintainer per view, like all
  * storage maintenance ops.
  */
object IncrementalView {

  private val SumType = DecimalType(30, 6)
  private val CastType = DecimalType(20, 6)

  /** Bootstrap (first call) or incrementally refresh (every later
    * call) the `sum(valueCol)/count(*) GROUP BY groupCol` view of
    * `baseTable` at `viewTable`. The base table must have its change
    * feed enabled. Returns the view as a DataFrame (pruned-read
    * surface).
    */
  def maintainSumCount(spark: SparkSession, baseTable: String,
      viewTable: String, groupCol: String, valueCol: String,
      checkpoint: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(viewTable)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(DataSkipping.changeFeedEnabled(spark, baseTable),
      s"$baseTable has no change data feed — the view cannot be " +
        "maintained incrementally; enable it with writeWithStats(" +
        "changeFeed = true) or enableChangeFeed")
    val bootstrapped = fs.exists(new org.apache.hadoop.fs.Path(
      s"$viewTable/${DataSkipping.StatsDir}"))
    val startAfter: Long =
      if (bootstrapped) -1L // pin already resolved; option is ignored
      else {
        val v = DataSkipping.tableVersions(spark, baseTable)
          .maxOption.getOrElse(0L)
        val snap = DataSkipping.readSkippingAt(spark, baseTable, v,
          col(groupCol).isNotNull || col(groupCol).isNull)
        DataSkipping.writeWithStats(
          snap.groupBy(col(groupCol)).agg(
            sum(col(valueCol).cast(CastType)).cast(SumType).as("sum_value"),
            count(lit(1)).as("cnt")),
          viewTable, Seq(groupCol))
        v
      }
    val reader = spark.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", baseTable)
    val withStart =
      if (bootstrapped) reader
      else reader.option("startingVersion", (startAfter + 1).toString)
    val q = withStart.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldBatch(spark, viewTable, groupCol, valueCol, batch)
      }
      .start()
    q.awaitTermination()
    DataSkipping.readSkipping(spark, viewTable,
      col(groupCol).isNotNull || col(groupCol).isNull)
  }

  /** Fold one feed micro-batch (possibly spanning several versions —
    * signed deltas are additive, so composition is free) into the
    * view.
    */
  private def foldBatch(spark: SparkSession, viewTable: String,
      groupCol: String, valueCol: String, batch: DataFrame): Unit = {
    val debit = col(DataSkipping.ChangeTypeCol)
      .isin("delete", "update_preimage")
    val signedVal = when(debit, -col(valueCol).cast(CastType))
      .otherwise(col(valueCol).cast(CastType))
    val delta = batch.groupBy(col(groupCol)).agg(
      sum(signedVal).cast(SumType).as("__d_sum"),
      sum(when(debit, -1L).otherwise(1L)).as("__d_cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = delta.select(groupCol).collect().map(_.get(0))
      if (keys.nonEmpty) {
        val current = DataSkipping.readSkipping(spark, viewTable,
          col(groupCol).isin(keys.toSeq: _*))
        val merged = delta.join(current, Seq(groupCol), "left")
          .select(col(groupCol),
            (coalesce(col("sum_value"), lit(0).cast(SumType)) +
              col("__d_sum")).cast(SumType).as("sum_value"),
            (coalesce(col("cnt"), lit(0L)) + col("__d_cnt")).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val dead = merged.filter(col("cnt") === 0L)
            .select(groupCol).collect().map(_.get(0))
          // a group emptied by deletes leaves the view entirely
          if (dead.nonEmpty)
            DataSkipping.deleteWhere(spark, viewTable,
              col(groupCol).isin(dead.toSeq: _*))
          DataSkipping.mergeUpsert(spark, viewTable,
            merged.filter(col("cnt") =!= 0L), Seq(groupCol))
        } finally merged.unpersist()
      }
    } finally delta.unpersist()
  }
}
