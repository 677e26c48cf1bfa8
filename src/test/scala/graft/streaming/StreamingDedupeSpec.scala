package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamingDedupeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("exactlyOnce drops duplicate (key, event-time) rows across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val deduped = Dedupe.exactlyOnce(
      input.toDS.toDF("trans_id", "item_id", "ts", "qty"),
      keys = Seq("trans_id", "item_id"), eventTimeCol = "ts")

    val q = deduped.writeStream.format("memory")
      .queryName("dedupe_out").outputMode("append").start()
    try {
      input.addData(
        (1L, 10L, ts("2024-01-01 00:00:00"), 5.0),
        (1L, 10L, ts("2024-01-01 00:00:00"), 5.0), // in-batch dup
        (2L, 20L, ts("2024-01-01 00:01:00"), 7.0))
      q.processAllAvailable()
      assert(s.table("dedupe_out").count() === 2)

      // same keys again in a later micro-batch -> still dropped
      input.addData((1L, 10L, ts("2024-01-01 00:00:00"), 5.0))
      q.processAllAvailable()
      assert(s.table("dedupe_out").count() === 2)

      // a genuinely new key passes
      input.addData((3L, 30L, ts("2024-01-01 00:02:00"), 1.0))
      q.processAllAvailable()
      assert(s.table("dedupe_out").count() === 3)
    } finally q.stop()
  }

  test("exactlyOnceByKey treats same keys at different event times as duplicates") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val deduped = Dedupe.exactlyOnceByKey(
      input.toDS.toDF("trans_id", "item_id", "ts", "qty"),
      keys = Seq("trans_id", "item_id"), eventTimeCol = "ts")

    val q = deduped.writeStream.format("memory")
      .queryName("dedupe_bykey_out").outputMode("append").start()
    try {
      input.addData(
        (1L, 10L, ts("2024-01-01 00:00:00"), 5.0),
        (1L, 10L, ts("2024-01-01 00:10:00"), 5.0)) // retransmit, later ts
      q.processAllAvailable()
      assert(s.table("dedupe_bykey_out").count() === 1)
    } finally q.stop()
  }
}
