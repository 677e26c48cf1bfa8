package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._

class IncrementalViewSpec extends SparkSpec {

  private def buildBase(s: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    import s.implicits._
    // groups g0..g4, 100 rows each, value = id (exact in decimal)
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, s"g${i % 5}", i.toDouble))
        .toDF("id", "grp", "value").repartitionByRange(4, col("id")),
      table, Seq("id"), bloomCols = Nil, changeFeed = true)
  }

  private def viewMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (BigDecimal, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((BigDecimal(r.getDecimal(1)), r.getLong(2)))).toMap

  test("incremental fold equals recompute across delete, group-migrating update, and merge") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_fold")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap

    DataSkipping.deleteWhere(s, base, col("id") < 50L) // v1
    DataSkipping.updateWhere(s, base, col("id") >= 400L && col("id") < 450L,
      Map("grp" -> lit("gX"), "value" -> (col("value") * -1))) // v2: migration
    DataSkipping.mergeUpsert(s, base,
      (1000L until 1020L).map(i => (i, "gNew", i.toDouble))
        .toDF("id", "grp", "value"), Seq("id")) // v3: inserts
    val view = refresh().orderBy("grp")

    val expect = DataSkipping.readSkipping(s, base, col("id") >= 0L)
      .groupBy("grp").agg(
        sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
          .as("sum_value"),
        count(lit(1)).as("cnt"))
      .orderBy("grp")
    assert(viewMap(view) === viewMap(expect),
      "incrementally-maintained view must equal the full recompute")
    assert(viewMap(view).contains("gX") && viewMap(view).contains("gNew"))
    // the migrated-away rows really debited their source groups
    assert(viewMap(view)("g0")._2 === 80L) // 100 - 10 (deleted) - 10 (migrated)
  }

  test("a group emptied by deletes leaves the view entirely") {
    val s = spark
    val root = tmpDir("ivw_dead")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh()
    // g3 = ids with id % 5 == 3 — delete every one of them
    DataSkipping.deleteWhere(s, base, col("id") % 5 === 3)
    val view = refresh()
    assert(!viewMap(view).contains("g3"),
      "a zero-count group must be deleted from the view, not kept as a 0 row")
    assert(viewMap(view).keySet === Set("g0", "g1", "g2", "g4"))
  }

  test("refresh with no new DML is a no-op; a re-refresh never double-applies a version") {
    val s = spark
    val root = tmpDir("ivw_idem")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh()
    DataSkipping.deleteWhere(s, base, col("id") < 100L)
    val after = viewMap(refresh())
    // two more refreshes with nothing new: the checkpointed offset
    // must make them no-ops (a double-applied v1 would debit twice)
    assert(viewMap(refresh()) === after)
    assert(viewMap(refresh()) === after)
    // and the view's generation history shows no extra DML between
    // the idle refreshes (bootstrap WRITE + fold MERGE only)
    val ops = DataSkipping.describeHistory(s, s"$root/view")
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops === Seq("MERGE", "WRITE"),
      s"idle refreshes must not commit view generations, got $ops")
  }

  test("a feed-less base table is refused") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_off")
    val base = s"$root/base"
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (i, s"g${i % 5}", i.toDouble))
        .toDF("id", "grp", "value"), base, Seq("id"))
    val e = intercept[IllegalArgumentException](
      IncrementalView.maintainSumCount(
        s, base, s"$root/view", "grp", "value", s"$root/ckpt"))
    assert(e.getMessage.contains("no change data feed"))
  }
}
