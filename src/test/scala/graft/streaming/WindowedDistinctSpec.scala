package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[WindowedDistinct]]: one streaming aggregation carries the HLL
  * registers; estimates equal batch sketching; state is bounded by
  * the register count, not the value cardinality.
  */
class WindowedDistinctSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamed window registers equal batch sketching; watermark closes windows") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val rows = (0 until 20000).map(i =>
      (ts(f"2024-01-01 08:${i % 10}%02d:00"), "a", (i % 5000).toLong)) ++
      (0 until 500).map(i =>
        (ts(f"2024-01-01 08:${11 + i % 5}%02d:00"), "b", i.toLong))
    val input = MemoryStream[(Timestamp, String, Long)]
    val regs = WindowedDistinct.registers(
      input.toDS.toDF("ts", "k", "v"),
      tsCol = "ts", windowDur = "10 minutes", watermark = "5 minutes",
      keys = Seq("k"), valueCol = "v", p = 10)
    val q = regs.writeStream
      .format("memory").queryName("win_hll").outputMode("update").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // update mode: last emission per register wins
      val landed = s.table("win_hll").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
          r.getLong(3)) -> r.getInt(4))
      val latest = landed.toMap
      val landedDf = latest.toSeq
        .map { case ((w0, w1, k, b), rho) => (w0, w1, k, b, rho) }
        .toDF("window_start", "window_end", "k", "hll_bucket", "hll_rho")
      val streamed = WindowedDistinct.estimates(landedDf, Seq("k"), 10)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2)) ->
          ((r.getAs[Long]("hll_t_scaled"), r.getAs[Double]("approx_distinct"))))
        .toMap

      // batch reference: window() as a plain grouping over the same rows
      val batchRegs = Sketches.sketch(
        rows.toDF("ts", "k", "v")
          .withColumn("w", window(col("ts"), "10 minutes"))
          .select(col("w.start").as("window_start"),
            col("w.end").as("window_end"), col("k"), col("v")),
        Seq("window_start", "window_end", "k"), "v", p = 10)
      val expect = Sketches.estimate(batchRegs,
          Seq("window_start", "window_end", "k"), 10)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2)) ->
          ((r.getAs[Long]("hll_t_scaled"), r.getAs[Double]("approx_distinct"))))
        .toMap
      assert(streamed === expect,
        "streamed registers must equal batch sketching bit-for-bit")
      // estimates are in the error envelope: key a has 5000 distinct
      // in the 08:00 window (raw regime: n >> 2.5m for p=10)
      val (_, estA) = streamed(("2024-01-01 08:00:00.0", "a"))
      assert(math.abs(estA - 5000) / 5000 < 0.13, s"estimate $estA")
      // register-bounded state: key a emitted at most 2^10 registers
      assert(latest.keys.count(_._3 == "a") <= 1024)
    } finally q.stop()
  }
}
