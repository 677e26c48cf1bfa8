package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Exactly-once must survive a query RESTART: dedup state lives in
  * the checkpoint, so a duplicate arriving after stop/start is still
  * dropped. This is the guarantee the reference's DLT pipeline gets
  * from its checkpointed `dropDuplicates` (03:321-322).
  */
class RestartRecoverySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedup state survives a stop/restart via the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ckpt = tmpDir("dedupe_ckpt")
    val out = tmpDir("dedupe_out")

    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    def deduped = Dedupe.exactlyOnce(
      input.toDS.toDF("trans_id", "item_id", "ts", "qty"),
      keys = Seq("trans_id", "item_id"), eventTimeCol = "ts")
    def start() = deduped.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    input.addData(
      (1L, 10L, ts("2024-01-01 00:00:00"), 5.0),
      (2L, 20L, ts("2024-01-01 00:01:00"), 7.0))
    q1.processAllAvailable()
    q1.stop()

    // restart: retransmit an already-seen row + one new row
    val q2 = start()
    input.addData(
      (1L, 10L, ts("2024-01-01 00:00:00"), 5.0), // dup from before restart
      (3L, 30L, ts("2024-01-01 00:02:00"), 1.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = s.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "duplicate crossed the restart boundary")
  }
}
