package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream inner join matches clicks within the window only") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val impressions = MemoryStream[(Int, Timestamp)]
    val clicks = MemoryStream[(Int, Timestamp)]
    val joined = StreamJoin.within(
      impressions.toDS.toDF("ad_id", "imp_ts"),
      clicks.toDS.toDF("ad_id", "click_ts"),
      keys = Seq("ad_id"), leftTs = "imp_ts", rightTs = "click_ts",
      within = "10 minutes", watermark = "10 minutes")

    val q = joined.writeStream
      .format("memory").queryName("ss_join").outputMode("append").start()
    try {
      impressions.addData(
        (1, ts("2024-01-01 08:00:00")),
        (2, ts("2024-01-01 08:00:00")),
        (3, ts("2024-01-01 08:00:00")))
      clicks.addData(
        (1, ts("2024-01-01 08:05:00")), // within window -> joins
        (2, ts("2024-01-01 08:20:00")), // outside 10 min -> no join
        (3, ts("2024-01-01 07:59:00"))) // BEFORE the impression -> no join
      q.processAllAvailable()
      // advance both watermarks so matched pairs are emitted (append
      // mode holds results until no earlier match can arrive)
      impressions.addData((99, ts("2024-01-01 10:00:00")))
      clicks.addData((99, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()

      val rows = s.table("ss_join")
        .select("ad_id", "imp_ts", "click_ts")
        .collect().map(r => (r.getInt(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
        .toSet
      assert(rows.contains((1, "2024-01-01 08:00:00.0", "2024-01-01 08:05:00.0")))
      assert(!rows.exists(_._1 == 2), "click 15 min after impression must not join")
      assert(!rows.exists(_._1 == 3), "click before impression must not join")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched rows with nulls after the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val impressions = MemoryStream[(Int, Timestamp)]
    val clicks = MemoryStream[(Int, Timestamp)]
    val joined = StreamJoin.withinOuter(
      impressions.toDS.toDF("ad_id", "imp_ts"),
      clicks.toDS.toDF("ad_id", "click_ts"),
      keys = Seq("ad_id"), leftTs = "imp_ts", rightTs = "click_ts",
      within = "10 minutes", watermark = "10 minutes")

    val q = joined.writeStream
      .format("memory").queryName("ss_join_outer").outputMode("append").start()
    try {
      impressions.addData(
        (1, ts("2024-01-01 08:00:00")), // will match
        (2, ts("2024-01-01 08:00:00"))) // never matches
      clicks.addData((1, ts("2024-01-01 08:05:00")))
      q.processAllAvailable()
      // before the watermark passes, ad 2 must NOT have a null row yet
      // (a match could still arrive)
      val early = s.table("ss_join_outer").collect()
      assert(!early.exists(_.getInt(0) == 2),
        "null row emitted before the watermark proved no match can come")

      // push both watermarks far past the window
      impressions.addData((99, ts("2024-01-01 10:00:00")))
      clicks.addData((99, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()

      val rows = s.table("ss_join_outer")
        .select("ad_id", "click_ts")
        .collect().map(r => (r.getInt(0), Option(r.getTimestamp(1)).map(_.toString)))
        .toSet
      assert(rows.contains((1, Some("2024-01-01 08:05:00.0"))), rows.toString)
      assert(rows.contains((2, None)),
        "unmatched impression must surface with a null right side: " + rows)
    } finally q.stop()
  }

  test("full-outer stream-stream join surfaces BOTH sides' orphans after the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val orders = MemoryStream[(Int, Timestamp)]
    val ships = MemoryStream[(Int, Timestamp)]
    val joined = StreamJoin.withinFullOuter(
      orders.toDS.toDF("order_id", "order_ts"),
      ships.toDS.toDF("order_id", "ship_ts"),
      keys = Seq("order_id"), leftTs = "order_ts", rightTs = "ship_ts",
      within = "10 minutes", watermark = "10 minutes")

    val q = joined.writeStream
      .format("memory").queryName("ss_join_full").outputMode("append").start()
    try {
      orders.addData(
        (1, ts("2024-01-01 08:00:00")),  // matches
        (2, ts("2024-01-01 08:00:00")))  // order with no shipment
      ships.addData(
        (1, ts("2024-01-01 08:05:00")),
        (3, ts("2024-01-01 08:02:00")))  // shipment with no order
      q.processAllAvailable()
      val early = s.table("ss_join_full")
        .select("order_ts", "ship_ts").collect()
      assert(!early.exists(r => r.isNullAt(0) || r.isNullAt(1)),
        "no null row may emit before the watermark proves the orphan")

      orders.addData((99, ts("2024-01-01 10:00:00")))
      ships.addData((99, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()

      val rows = s.table("ss_join_full")
        .select("order_id", "order_ts", "ship_ts")
        .collect().map(r => (r.getInt(0),
          Option(r.getTimestamp(1)).map(_.toString),
          Option(r.getTimestamp(2)).map(_.toString))).toSet
      assert(rows.contains((1,
        Some("2024-01-01 08:00:00.0"), Some("2024-01-01 08:05:00.0"))))
      assert(rows.contains((2, Some("2024-01-01 08:00:00.0"), None)),
        s"left orphan must surface: $rows")
      assert(rows.contains((3, None, Some("2024-01-01 08:02:00.0"))),
        s"right orphan must surface: $rows")
    } finally q.stop()
  }

  test("batch frames run through the same join (parity path)") {
    val s = spark
    import s.implicits._
    val imp = Seq((1, ts("2024-01-01 08:00:00")), (2, ts("2024-01-01 09:00:00")))
      .toDF("ad_id", "imp_ts")
    val clk = Seq((1, ts("2024-01-01 08:09:00")), (2, ts("2024-01-01 09:30:00")))
      .toDF("ad_id", "click_ts")
    val out = StreamJoin.within(imp, clk, Seq("ad_id"), "imp_ts", "click_ts",
      within = "10 minutes", watermark = "1 hour")
      .select("ad_id").collect().map(_.getInt(0)).toSeq
    assert(out === Seq(1))
  }

  test("stream-static broadcast enrichment: dims join the stream, no state, no watermark") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.broadcast
    implicit val ctx = s.sqlContext

    // the DLT-silver pattern (reference 03: silver items enriched from
    // static dims): a static side needs no watermark and no join state
    // — it is re-resolved per micro-batch and broadcast to the stream
    val dim = Seq((1, "widget"), (2, "gadget")).toDF("item_id", "item_name")
    val events = MemoryStream[(Int, Int)]
    val enriched = events.toDS.toDF("item_id", "qty")
      .join(broadcast(dim), Seq("item_id"), "left")

    val q = enriched.writeStream
      .format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      events.addData((1, 10), (3, 5)) // 3 has no dim row -> null name
      q.processAllAvailable()
      val rows = s.table("enrich_out").collect()
        .map(r => r.getInt(0) -> Option(r.getString(2))).toMap
      assert(rows === Map(1 -> Some("widget"), 3 -> None))
      // the actual claim: a static side keeps NO streaming state
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not create state operators")
    } finally q.stop()
  }
}
