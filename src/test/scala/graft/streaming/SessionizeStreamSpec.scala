package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window closes a session once the watermark passes it") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = SessionizeStream.sessionWindows(
      input.toDS.toDF("user_id", "ts"),
      keyCol = "user_id", tsCol = "ts",
      gap = "30 minutes", watermark = "10 minutes")

    val q = sessions.writeStream.format("memory")
      .queryName("sw_out").outputMode("append").start()
    try {
      // one session for user 1: 10:00 + 10:05
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // push the watermark far past 10:35 with another key
      input.addData((2L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()

      val rows = s.table("sw_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      assert(rows.contains((1L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits gap-closed and timeout-closed sessions") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[SessionizeStream.Event]
    val withWm = input.toDS.withWatermark("ts", "10 minutes")
      .as[SessionizeStream.Event]
    val sessions = SessionizeStream.sessionizeTyped(withWm, gapMs = 30 * 60 * 1000)

    val q = sessions.writeStream.format("memory")
      .queryName("fmgws_out").outputMode("append").start()
    try {
      // user 1: two events in one session, then a third far later in
      // the SAME batch -> the first session closes by in-batch gap
      input.addData(
        SessionizeStream.Event(1L, ts("2024-01-01 10:00:00")),
        SessionizeStream.Event(1L, ts("2024-01-01 10:05:00")),
        SessionizeStream.Event(1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val afterBatch1 = s.table("fmgws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      assert(afterBatch1.toSet === Set(
        (1L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))

      // advance the watermark beyond 12:00 + gap with another key ->
      // the open session for user 1 times out and is emitted
      input.addData(SessionizeStream.Event(2L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      input.addData(SessionizeStream.Event(2L, ts("2024-01-01 16:00:00")))
      q.processAllAvailable()
      val all = s.table("fmgws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      assert(all.contains((1L, 1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"))))
    } finally q.stop()
  }
}
