package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class WindowedAggSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling stream windows aggregate per window+key; watermark drops too-late rows") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val windowed = WindowedAgg.windowed(
      input.toDS.toDF("ts", "k", "v"),
      tsCol = "ts", windowDur = "10 minutes", watermark = "10 minutes",
      keys = Seq("k"),
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))

    val q = windowed.writeStream
      .format("memory").queryName("win_agg").outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 08:01:00"), "a", 1.0),
        (ts("2024-01-01 08:02:00"), "a", 2.0),
        (ts("2024-01-01 08:11:00"), "b", 1.0))
      q.processAllAvailable()
      // advance the watermark far past the 08:00 window
      input.addData((ts("2024-01-01 09:00:00"), "a", 1.0))
      q.processAllAvailable()
      // too late: 08:00-08:10 closed (watermark 08:50) -> dropped
      input.addData((ts("2024-01-01 08:03:00"), "a", 100.0))
      q.processAllAvailable()

      // update mode re-emits a row per updated window each batch, in
      // batch order; toMap keeps the last (= newest) emission per
      // (window_start, k)
      val state = s.table("win_agg")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2)) ->
          ((r.getLong(3), r.getDouble(4))))
        .toMap
      assert(state(("2024-01-01 08:00:00.0", "a")) === ((2L, 3.0)),
        "late row beyond the watermark must not update its window")
      assert(state(("2024-01-01 08:10:00.0", "b")) === ((1L, 1.0)))
      assert(state(("2024-01-01 09:00:00.0", "a")) === ((1L, 1.0)))
    } finally q.stop()
  }

  test("sliding windows assign each row to windowDur/slide windows") {
    val s = spark
    import s.implicits._
    val df = Seq((ts("2024-01-01 08:15:00"), 1.0)).toDF("ts", "v")
    val out = WindowedAgg.windowed(df, tsCol = "ts",
      windowDur = "20 minutes", slide = Some("10 minutes"),
      aggs = Seq(count(lit(1)).as("n")))
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01 08:00:00.0", 1L), ("2024-01-01 08:10:00.0", 1L)))
  }
}
