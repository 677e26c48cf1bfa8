package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture helpers.
  *
  * Re-expresses the reference's `apply_changes` CDC upsert
  * (pos-dlt `03_Bronze-to-Silver ETL.py:375-384`: keep the latest row
  * per (store_id, item_id) sequenced by date_time) as a Spark
  * aggregation.
  *
  * Scale design: implemented as `max(struct(seq..., payload...))`
  * rather than a `row_number()` window. The aggregate gets map-side
  * partial aggregation (each input partition collapses to at most
  * |distinct keys| rows before the shuffle), while a window would
  * shuffle AND sort every raw row. At 100 TB with bounded key
  * cardinality (stores x items) the partial-agg version moves orders
  * of magnitude less data.
  */
object Cdc {

  /** Latest row per key group, ordered by `seqCols` (compared
    * lexicographically; callers must include a unique tiebreaker for
    * determinism, e.g. a monotonic id as the last seq column).
    *
    * Output columns: keys ++ seqCols ++ payload, in that order.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      seqCols: Seq[String],
      payload: Seq[String]): DataFrame = {
    val ordered = (seqCols ++ payload).map(col)
    val keyCols = keys.map(col)
    df.groupBy(keyCols: _*)
      .agg(max(struct(ordered: _*)).as("__latest"))
      .select(keyCols ++ (seqCols ++ payload).map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Merge a batch of updates into a current-state snapshot: union
    * then latest-per-key. This is the foreachBatch body used by the
    * streaming CDC path (see graft.streaming.CdcStream).
    */
  def upsert(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      seqCols: Seq[String],
      payload: Seq[String]): DataFrame =
    latestByKey(current.unionByName(updates), keys, seqCols, payload)

  /** Column marking tombstone rows in a tombstone-retaining state. */
  val DeletedCol = "__del"

  /** Full `apply_changes` semantics including deletes — the
    * `APPLY AS DELETE WHEN <cond>` clause of the DLT API the plain
    * [[upsert]] lacks: among all rows per key the LATEST by `seqCols`
    * wins, and if that winner is a delete marker the key is deleted.
    * Sequencing rules match DLT: a delete older than the current row
    * is ignored; a row newer than a delete re-inserts the key.
    *
    * `retainTombstones` decides what "deleted" means across MERGES:
    *  - `true` (what a multi-batch stream needs): the winning delete
    *    stays in the state as a tombstone row (`__del = true`), so a
    *    LATE update with an older sequence arriving in a later batch
    *    still loses to it — without the tombstone that late row
    *    would silently resurrect the key. Filter `!__del` on read.
    *    `current` may already carry a `__del` column from a previous
    *    merge.
    *  - `false` (single-shot merges): tombstones are dropped from
    *    the output immediately.
    *
    * `deleteWhen` is evaluated on `updates`; null results count as
    * not-delete.
    *
    * TIES: when a delete and an update carry EQUAL `seqCols`, the
    * DELETE wins — the marker is compared right after the sequence
    * (before payload) in the max-struct, so the outcome is a stated
    * precedence rule, never a function of payload values. Ties
    * between two non-deletes still fall through to payload order;
    * include a unique tiebreaker in `seqCols` if updates may tie.
    *
    * Scale: identical shape to [[upsert]] — ONE partial-aggregated
    * shuffle; the marker is one boolean riding the max(struct).
    * Retained tombstones cost one state row per deleted key (bounded
    * by key cardinality like every other state row).
    */
  def applyChanges(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      seqCols: Seq[String],
      payload: Seq[String],
      deleteWhen: Column,
      retainTombstones: Boolean = false): DataFrame = {
    val cols = keys ++ seqCols ++ payload
    val cur =
      if (current.columns.contains(DeletedCol))
        current.select((cols :+ DeletedCol).map(col): _*)
      else current.select(cols.map(col): _*).withColumn(DeletedCol, lit(false))
    val upd = updates.select(cols.map(col) :+
      coalesce(deleteWhen, lit(false)).as(DeletedCol): _*)
    val merged = latestByKey(cur.unionByName(upd), keys, seqCols, DeletedCol +: payload)
      .select((keys ++ seqCols ++ payload :+ DeletedCol).map(col): _*)
    if (retainTombstones) merged
    else merged.filter(!col(DeletedCol)).drop(DeletedCol)
  }
}
