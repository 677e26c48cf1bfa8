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

  /** Full `apply_changes` semantics including deletes — the
    * `APPLY AS DELETE WHEN <cond>` clause of the DLT API the plain
    * [[upsert]] lacks: among all rows per key the LATEST by `seqCols`
    * wins, and if that winner is a delete marker the key disappears
    * from the state entirely. Sequencing rules match DLT: a delete
    * older than the current row is ignored; a row newer than a
    * delete re-inserts the key.
    *
    * `deleteWhen` is evaluated on `updates` (rows already in `current`
    * are never markers — deleted keys left the state on a previous
    * merge). Null condition results count as not-delete.
    *
    * Scale: identical shape to [[upsert]] — ONE partial-aggregated
    * shuffle; the marker is one boolean riding the max(struct), and
    * tombstones are dropped by a post-aggregate filter at
    * |distinct keys| volume, so deleted keys cost nothing after the
    * merge that removes them.
    */
  def applyChanges(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      seqCols: Seq[String],
      payload: Seq[String],
      deleteWhen: Column): DataFrame = {
    val cols = keys ++ seqCols ++ payload
    val cur = current.select(cols.map(col): _*).withColumn("__del", lit(false))
    val upd = updates.select(cols.map(col) :+
      coalesce(deleteWhen, lit(false)).as("__del"): _*)
    latestByKey(cur.unionByName(upd), keys, seqCols, payload :+ "__del")
      .filter(!col("__del"))
      .drop("__del")
  }
}
