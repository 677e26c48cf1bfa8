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
}
