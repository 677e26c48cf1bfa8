package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Inventory.dailySnapshots]]: periodic-snapshot semantics —
  * last-of-day wins, gap days forward-fill, per-key grids start at
  * first observation and end at the global data end.
  */
class InventorySpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap days carry the prior position; last event of the day wins") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 18:00:00"), 12.0), // later same day wins
      (1L, ts("2024-01-04 08:00:00"), 7.0),  // 2nd/3rd fill with 12.0
      (2L, ts("2024-01-03 10:00:00"), 5.0)   // starts later, shorter grid
    ).toDF("store_id", "ts", "value")
    val out = Inventory.dailySnapshots(ev, Seq("store_id"), "ts", "value")
      .orderBy("store_id", "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01", 12.0),
      (1L, "2024-01-02", 12.0),
      (1L, "2024-01-03", 12.0),
      (1L, "2024-01-04", 7.0),
      (2L, "2024-01-03", 5.0),
      (2L, "2024-01-04", 5.0))) // extends to the GLOBAL end day
  }

  test("exact-timestamp ties break by highest value, deterministically") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 3.0),
      (1L, ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("store_id", "ts", "value")
    val out = Inventory.dailySnapshots(ev, Seq("store_id"), "ts", "value")
      .collect().map(_.getDouble(2))
    assert(out.toSeq === Seq(9.0))
  }

  test("plan shape: day-collapse is a partial agg, fill window is key-partitioned, end day broadcast") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 7).as("store_id"), col("ts"), col("value"))
    val df = Inventory.dailySnapshots(ev, Seq("store_id"), "ts", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"), "day-collapse map-side combine\n" + plan)
    assert(plan.contains("BroadcastExchange"), "end-day 1-row broadcast\n" + plan)
    // the one Window is partitioned by the key — no corpus-global sort
    assert("Window \\[last".r.findAllIn(plan).length === 1, plan)
    assert(df.count() > 0)
  }
}
