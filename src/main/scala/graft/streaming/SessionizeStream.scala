package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import scala.collection.mutable

/** Streaming sessionization — the stream-side companion of
  * [[graft.operators.Sessionize]].
  *
  * Two idiomatic forms:
  *  - `sessionWindows`: the Spark-native `session_window` gap
  *    aggregation (watermark-bounded state, sessions emitted when
  *    the watermark passes their close).
  *  - `sessionizeTyped`: a custom `flatMapGroupsWithState`
  *    sessionizer for when session semantics outgrow the built-in
  *    (e.g. per-key gaps, early emission) — state is one open
  *    session per key, closed either by an in-batch gap or by an
  *    event-time timeout at sessionEnd + gap.
  *
  * Scale: state per key is O(1) (one open session accumulator, never
  * the event list); the watermark/timeout evicts idle keys, so state
  * size tracks ACTIVE keys only.
  */
object SessionizeStream {

  /** Built-in session-window aggregation: one output row per closed
    * session with count and bounds.
    */
  def sessionWindows(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col(keyCol), col("n_events"),
        col("session_start"), col("session_end"))

  final case class Event(key: Long, ts: Timestamp)
  final case class OpenSession(start: Long, end: Long, n: Long)
  final case class Session(key: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** Custom-state sessionizer. Input must already carry a watermark
    * on `ts` (EventTimeTimeout needs one).
    */
  def sessionizeTyped(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed sessionEnd + gap: the session is final
            val s = state.get
            state.remove()
            Iterator(Session(key, s.n, new Timestamp(s.start), new Timestamp(s.end)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val out = mutable.Buffer[Session]()
            var acc = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              acc match {
                case Some(a) if t - a.end <= gapMs =>
                  acc = Some(OpenSession(a.start, math.max(a.end, t), a.n + 1))
                case Some(a) =>
                  out += Session(key, a.n, new Timestamp(a.start), new Timestamp(a.end))
                  acc = Some(OpenSession(t, t, 1))
                case None =>
                  acc = Some(OpenSession(t, t, 1))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.end + gapMs)
            }
            out.iterator
          }
      }
  }
}
