package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins.
  *
  * The canonical training/analytics shape: correlate two unbounded
  * streams on a key within an event-time range (impression⋈click,
  * order⋈shipment, request⋈response). Spark buffers both sides in
  * state; the watermark PLUS the range bound is what lets it evict —
  * without the range condition state grows forever, so this API
  * makes the bound mandatory.
  *
  * Scale: state per side is (rate x (watermark delay + range))
  * rows, independent of stream length; the join itself is a normal
  * keyed shuffle between the two streams' state stores.
  */
object StreamJoin {

  /** Inner-join `left ⋈ right` on equal `keys` where the right
    * event's time is within [left.ts, left.ts + within] — "a click
    * follows its impression by at most `within`".
    *
    * Column names of the two inputs must not collide except for
    * `keys` (rename upstream); output carries keys + both sides'
    * remaining columns.
    *
    * @param within    max event-time gap, e.g. "10 minutes"
    * @param watermark max lateness on both sides, e.g. "1 hour"
    */
  def within(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      within: String, watermark: String): DataFrame =
    rangeJoin(left, right, keys, leftTs, rightTs, within, watermark, "inner")

  /** LEFT OUTER variant of [[within]]: every left event is emitted —
    * matched rows as they pair up, UNMATCHED rows with nulls on the
    * right once the watermark proves no match can still arrive (an
    * impression with no click inside the window IS a result:
    * conversion-funnel and timeout-detection queries need exactly
    * these rows). Same state bound as the inner join; the null
    * emission is what the watermark makes safe.
    */
  def withinOuter(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      within: String, watermark: String): DataFrame =
    rangeJoin(left, right, keys, leftTs, rightTs, within, watermark, "left_outer")

  /** FULL OUTER variant of [[within]] — both sides' orphans are
    * results (reconciliation queries: orders without shipments AND
    * shipments without orders in one pass). Each side's unmatched
    * rows emit with nulls once the watermark proves no partner can
    * arrive; the state bound is the same as the inner join — the
    * outer-ness changes what is EMITTED at eviction, not what is
    * kept.
    */
  def withinFullOuter(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      within: String, watermark: String): DataFrame =
    rangeJoin(left, right, keys, leftTs, rightTs, within, watermark, "full_outer")

  private def rangeJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      within: String, watermark: String, joinType: String): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    val l = withWatermarkIfStreaming(left, leftTs, watermark).alias("l")
    val r = withWatermarkIfStreaming(right, rightTs, watermark).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val rangeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    val joined = l.join(r, keyCond && rangeCond, joinType)
    if (joinType == "full_outer")
      // a right orphan has NULL left keys: surface the key from
      // whichever side holds it, then drop both originals
      keys.foldLeft(joined)((df, k) =>
        df.withColumn(s"__k_$k", coalesce(col(s"l.$k"), col(s"r.$k")))
          .drop(col(s"l.$k")).drop(col(s"r.$k"))
          .withColumnRenamed(s"__k_$k", k))
    else
      // drop the right side's duplicate key columns
      keys.foldLeft(joined)((df, k) => df.drop(col(s"r.$k")))
  }

  private def withWatermarkIfStreaming(
      df: DataFrame, tsCol: String, watermark: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
}
