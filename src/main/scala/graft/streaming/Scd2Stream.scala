package graft.streaming

import graft.operators.Cdc
import graft.sources.DataSkipping
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuously-maintained SCD TYPE 2 history of a stats table,
  * driven by its change data feed — the DLT
  * `apply_changes(stored_as_scd_type = 2)` loop closed end to end:
  * the base table takes ordinary DML (CDC merges, deletes, updates),
  * and `histTable` accumulates one row per key VERSION with
  * `[__start_change_ver, __end_change_ver)` validity intervals,
  * SEQUENCED BY COMMIT VERSION. Version-sequencing is what makes the
  * derivation well-defined from a feed: a CDC update need not touch
  * any payload timestamp, but its commit version always advances, and
  * the feed's update_postimage at version v supersedes the image
  * before it — DLT's "sequence_by must advance" rule satisfied by
  * construction.
  *
  * Per micro-batch: feed rows become change events
  * (`insert`/`update_postimage` → upsert at their commit version,
  * `delete` → delete event, `update_preimage` → dropped — the
  * postimage at the same version carries the new truth), the batch's
  * keys' CURRENT history rows are read back (stats-envelope +
  * broadcast semi-join — O(batch keys' history), the
  * [[IncrementalView]] shape), re-derived through
  * [[Cdc.scdType2Apply]] (late-splice reconstruction included), and
  * swapped in with ONE atomic [[DataSkipping.replaceKeyed]] commit —
  * a version set must replace wholesale; a delete-then-insert pair
  * would have a torn middle no replay could repair. EXACTLY-ONCE:
  * the replace carries `txn = (maintainer id, batchId)`, so
  * foreachBatch's at-least-once replay of a committed batch is a
  * detected no-op.
  *
  * BOOTSTRAP: the frozen snapshot at version V becomes each current
  * key's first version (`__start_change_ver = V`, open end) and the
  * feed pins at V+1 — no double-count window. The maintained
  * invariant, gated by the oracle: the history's OPEN rows equal the
  * base table's live state at every refresh point.
  */
object Scd2Stream {

  val StartCol = "__start_change_ver"
  val EndCol = "__end_change_ver"

  private[streaming] def appId(histTable: String, checkpoint: String): String =
    s"graft-scd2-stream:$histTable@$checkpoint"

  /** Bootstrap or incrementally refresh the SCD2 history of
    * `baseTable` at `histTable`; returns the full history frame.
    * `payload` = the base columns to track (all non-key columns is
    * typical).
    */
  def maintain(spark: SparkSession, baseTable: String, histTable: String,
      keys: Seq[String], payload: Seq[String],
      checkpoint: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(histTable)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(DataSkipping.changeFeedEnabled(spark, baseTable),
      s"$baseTable has no change data feed — enable it with " +
        "writeWithStats(changeFeed = true) or enableChangeFeed")
    val bootstrapped = fs.exists(new org.apache.hadoop.fs.Path(
      s"$histTable/${DataSkipping.StatsDir}"))
    if (!bootstrapped) {
      val v = DataSkipping.tableVersions(spark, baseTable)
        .maxOption.getOrElse(0L)
      val snap = DataSkipping.readSkippingAt(spark, baseTable, v, lit(true))
      DataSkipping.writeWithStats(
        snap.select((keys ++ payload).map(col): _*)
          .withColumn(StartCol, lit(v))
          .withColumn(EndCol, lit(null).cast("long")),
        histTable, keys)
    }
    val reader = spark.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", baseTable)
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        FoldTimings.timed("scd2_stream", batchId) {
          foldBatch(spark, histTable, keys, payload, batch, batchId,
            checkpoint)
        }
      }
      .start()
    q.awaitTermination()
    readHistory(spark, histTable, keys)
  }

  /** The full history (every version row, open and closed). */
  def readHistory(spark: SparkSession, histTable: String,
      keys: Seq[String]): DataFrame =
    DataSkipping.readSkipping(spark, histTable, lit(true))

  /** Only the OPEN rows — the live dimension state. */
  def readCurrent(spark: SparkSession, histTable: String,
      keys: Seq[String]): DataFrame =
    readHistory(spark, histTable, keys).filter(col(EndCol).isNull)

  private[streaming] def foldBatch(spark: SparkSession, histTable: String,
      keys: Seq[String], payload: Seq[String], batch: DataFrame,
      batchId: Long, checkpoint: String): Unit = {
    val app = appId(histTable, checkpoint)
    if (DataSkipping.txnVersion(spark, histTable, app).exists(_ >= batchId))
      return
    val t = col(DataSkipping.ChangeTypeCol)
    val events = batch.filter(t =!= "update_preimage")
      .select((keys ++ payload).map(col) ++ Seq(
        col(DataSkipping.CommitVersionCol).as("change_ver"),
        (t === "delete").as("__del")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one action: emptiness rides the envelope aggregate
      val env = events.agg(min(col(keys.head)), max(col(keys.head)),
        count(lit(1))).head()
      if (env.getLong(2) != 0L) {
        val affected = events.select(keys.map(col): _*).distinct()
        val inRange =
          col(keys.head).between(lit(env.get(0)), lit(env.get(1)))
        val current = DataSkipping.readSkipping(spark, histTable, inRange)
          .join(broadcast(affected), keys, "left_semi")
        val rederived = Cdc.scdType2Apply(current, events,
          keys, Seq("change_ver"), payload, deleteWhen = col("__del"))
        DataSkipping.replaceKeyed(spark, histTable, rederived, keys,
          txn = Some(app -> batchId))
      }
    } finally events.unpersist()
  }
}
