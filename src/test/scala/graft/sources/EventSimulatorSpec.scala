package graft.sources

import graft.SparkSpec
import graft.operators.Transactionalize
import org.apache.spark.sql.functions._

class EventSimulatorSpec extends SparkSpec {

  test("batch generation is deterministic, in-range, and chains into transactionalize") {
    val a = EventSimulator.batch(spark, 500, nStores = 7, nItems = 50)
    val b = EventSimulator.batch(spark, 500, nStores = 7, nItems = 50)
    // fully deterministic INCLUDING timestamps (fixed base epoch)
    val rows = a.collect().map(_.toString).sorted.toSeq
    assert(rows === b.collect().map(_.toString).sorted.toSeq)
    assert(rows.size === 500)

    val stats = a.agg(
      min("store_id"), max("store_id"),
      min("item_id"), max("item_id"),
      min("change_type_id"), max("change_type_id"),
      sum(when(col("quantity") < 0, 1).otherwise(0))).head
    assert(stats.getInt(0) >= 1 && stats.getInt(1) <= 7)
    assert(stats.getInt(2) >= 1 && stats.getInt(3) <= 50)
    assert(stats.getInt(4) >= 0 && stats.getInt(5) <= 3)
    assert(stats.getLong(6) > 0, "some returns (negative quantity) expected")

    // the simulator's shape feeds the reference's txn-assembly chain
    val txns = Transactionalize.assemble(a,
      keys = Seq("trans_id", "store_id", "change_type_id"),
      itemCols = Seq("item_id", "quantity"))
    assert(txns.count() === 500) // one txn per trans_id here
  }

  test("streaming generation delivers the same schema incrementally") {
    val s = spark
    val df = EventSimulator.stream(s, rowsPerSecond = 200)
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").queryName("sim_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1200)
      q.processAllAvailable()
      val got = s.table("sim_out")
      assert(got.columns.toSeq === Seq("trans_id", "store_id", "item_id",
        "date_time", "quantity", "change_type_id"))
      assert(got.count() > 0)
    } finally q.stop()
  }
}
