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

  test("dedup state runs on the RocksDB state store (larger-than-heap state path)") {
    // At 100 TB stream scale, dedup/session/join state outgrows the
    // default in-memory (HDFS-backed) store; Spark's bundled RocksDB
    // provider spills state to local disk. The operators must be
    // provider-agnostic — same results, state actually held by
    // RocksDB.
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val deduped = Dedupe.exactlyOnce(
      input.toDS.toDF("trans_id", "item_id", "ts", "qty"),
      keys = Seq("trans_id", "item_id"), eventTimeCol = "ts")
    val q = deduped.writeStream.format("memory")
      .queryName("dedupe_rocks_out").outputMode("append").start()
    try {
      input.addData(
        (1L, 10L, ts("2024-01-01 00:00:00"), 5.0),
        (2L, 20L, ts("2024-01-01 00:01:00"), 7.0))
      q.processAllAvailable()
      input.addData((1L, 10L, ts("2024-01-01 00:00:00"), 5.0)) // cross-batch dup
      q.processAllAvailable()
      assert(s.table("dedupe_rocks_out").count() === 2)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows === 2, s"expected RocksDB-held state rows, got $stateRows")
    } finally {
      q.stop()
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
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
