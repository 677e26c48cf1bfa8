package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestAtOrBefore picks the newest right row at or before each left row") {
    val s = spark
    import s.implicits._
    val orders = Seq(
      (1L, 100, ts("2024-01-01 08:00:00")), // before any price -> nulls
      (2L, 100, ts("2024-01-01 10:00:00")), // exact-equal ts matches
      (3L, 100, ts("2024-01-01 12:30:00")), // between updates -> 10:00 price
      (4L, 200, ts("2024-01-01 12:00:00"))) // other key
      .toDF("order_id", "item", "ts")
    val prices = Seq(
      (100, ts("2024-01-01 10:00:00"), 5.0, 1L),
      (100, ts("2024-01-01 13:00:00"), 7.0, 2L),
      (200, ts("2024-01-01 09:00:00"), 9.0, 3L))
      .toDF("item", "p_ts", "price", "p_id")

    val out = AsOfJoin.latestAtOrBefore(orders, prices,
      keys = Seq("item"), leftTs = "ts", rightTs = "p_ts",
      payload = Seq("price"), tieBreak = Some("p_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(out === Map(1L -> None, 2L -> Some(5.0), 3L -> Some(5.0), 4L -> Some(9.0)))
  }

  test("checkUniqueLeft surfaces duplicate left rows as an error instead of silent row loss") {
    val s = spark
    import s.implicits._
    val dupLeft = Seq(
      (100, ts("2024-01-01 10:00:00")),
      (100, ts("2024-01-01 10:00:00"))) // exact duplicate row
      .toDF("item", "ts")
    val prices = Seq((100, ts("2024-01-01 09:00:00"), 5.0, 1L))
      .toDF("item", "p_ts", "price", "p_id")

    // default: duplicates silently collapse (documented behavior)
    val silent = AsOfJoin.latestAtOrBefore(dupLeft, prices,
      keys = Seq("item"), leftTs = "ts", rightTs = "p_ts",
      payload = Seq("price"))
    assert(silent.count() === 1)

    // debug mode: the violation fails loudly with the offending row
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.latestAtOrBefore(dupLeft, prices,
        keys = Seq("item"), leftTs = "ts", rightTs = "p_ts",
        payload = Seq("price"), checkUniqueLeft = true)
    }
    assert(e.getMessage.contains("pairwise distinct"))

    // distinct lefts pass the check unchanged
    val ok = AsOfJoin.latestAtOrBefore(
      dupLeft.dropDuplicates(), prices,
      keys = Seq("item"), leftTs = "ts", rightTs = "p_ts",
      payload = Seq("price"), checkUniqueLeft = true)
    assert(ok.collect().map(_.getDouble(3)).toSeq === Seq(5.0))
  }

  test("a chained as-of join is rejected loudly, not silently duplicated") {
    val s = spark
    import s.implicits._
    val orders = Seq((1L, 100, ts("2024-01-01 12:00:00"))).toDF("order_id", "item", "ts")
    val prices = Seq((100, ts("2024-01-01 10:00:00"), 5.0)).toDF("item", "p_ts", "price")
    val once = AsOfJoin.latestAtOrBefore(orders, prices,
      keys = Seq("item"), leftTs = "ts", rightTs = "p_ts", payload = Seq("price"))
    assert(once.columns.contains("asof_ts"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.latestAtOrBefore(once,
        Seq((100, ts("2024-01-01 11:00:00"), 1.0)).toDF("item", "q_ts", "promo"),
        keys = Seq("item"), leftTs = "ts", rightTs = "q_ts", payload = Seq("promo"))
    }
    assert(e.getMessage.contains("asof_ts"))
  }

  test("equal timestamps resolve by the tie-break column, greatest wins") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (1, ts("2024-01-01 09:00:00"), 10.0, 1L),
      (1, ts("2024-01-01 09:00:00"), 20.0, 2L)) // same ts, higher tie-break
      .toDF("k", "r_ts", "v", "r_id")
    val out = AsOfJoin.latestAtOrBefore(left, right,
      keys = Seq("k"), leftTs = "ts", rightTs = "r_ts",
      payload = Seq("v"), tieBreak = Some("r_id"))
      .collect().map(r => r.getDouble(4))
    assert(out.toSeq === Seq(20.0))
  }
}
