package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time sessionization (batch form).
  *
  * The reference replays its event stream with inter-event gaps
  * (pos-dlt `02_Data Generation.py:276-284`); the natural analytics
  * companion is gap-based sessionization: a new session starts when
  * the gap since the previous event of the same key exceeds a
  * threshold.
  *
  * Scale design: a single hash-partition by key + in-partition sort
  * (one shuffle); the two window functions (lag + running sum) share
  * the same window frame so Catalyst evaluates them in one Window
  * operator. The streaming equivalent lives in
  * graft.streaming (flatMapGroupsWithState / session_window).
  */
object Sessionize {

  /** Assign `session_id` (0-based per key) using a max-gap rule, then
    * aggregate one row per session.
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      tieBreak: Option[String] = None): DataFrame = {
    val orderCols: Seq[Column] = col(tsCol) +: tieBreak.map(col).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val newSession = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > expr(s"INTERVAL $gap"), 1
    ).otherwise(lit(0))
    df.withColumn("__new_session",
        when(lag(col(tsCol), 1).over(w).isNull, lit(0)).otherwise(newSession))
      .withColumn("session_id", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** One row per (key, session): event count and session bounds. */
  def sessionSummary(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      tieBreak: Option[String] = None): DataFrame =
    sessionize(df, keyCol, tsCol, gap, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
