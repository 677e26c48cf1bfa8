package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class CdcStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch upsert keeps the latest row per key across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val stateDir = tmpDir("cdc_state")
    val ckpt = tmpDir("cdc_ckpt")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("store_id", "item_id"), seqCols = Seq("date_time"),
      payload = Seq("quantity"))

    val input = MemoryStream[(Int, Int, Timestamp, Int)]
    val updates = input.toDS.toDF("store_id", "item_id", "date_time", "quantity")

    input.addData(
      (1, 100, ts("2024-01-01 08:00:00"), 50),
      (1, 100, ts("2024-01-01 09:00:00"), 40), // newer wins
      (2, 200, ts("2024-01-01 08:30:00"), 10))
    val q1 = CdcStream.run(updates, store, ckpt)
    q1.awaitTermination()

    val v1 = store.current.get.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(3)).toMap
    assert(v1 === Map((1, 100) -> 40, (2, 200) -> 10))

    // second round: an older row must NOT overwrite, a newer one must
    input.addData(
      (1, 100, ts("2024-01-01 07:00:00"), 99), // stale
      (2, 200, ts("2024-01-01 10:00:00"), 5)) // newer
    val q2 = CdcStream.run(updates, store, ckpt)
    q2.awaitTermination()

    val v2 = store.current.get.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(3)).toMap
    assert(v2 === Map((1, 100) -> 40, (2, 200) -> 5))
  }
}
