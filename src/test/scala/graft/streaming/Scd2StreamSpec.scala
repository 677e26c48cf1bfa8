package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._

/** Continuous SCD2 maintenance from the change feed
  * ([[Scd2Stream]]).
  */
class Scd2StreamSpec extends SparkSpec {

  private def build(s: org.apache.spark.sql.SparkSession, base: String): Unit = {
    import s.implicits._
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      base, Seq("id"), bloomCols = Nil, changeFeed = true)
  }

  private def hist(root: String): Map[(Long, Long), (String, Option[Long])] =
    Scd2Stream.readHistory(spark, s"$root/hist", Seq("id"))
      .collect().map { r =>
        (r.getAs[Long]("id"), r.getAs[Long](Scd2Stream.StartCol)) ->
          ((r.getAs[String]("v"),
            Option(r.getAs[Any](Scd2Stream.EndCol)).map(_.asInstanceOf[Long])))
      }.toMap

  test("history intervals follow the DML versions; open rows always equal the live state") {
    val s = spark
    import s.implicits._
    val root = tmpDir("scd2s")
    val base = s"$root/base"
    build(s, base)
    def refresh() = Scd2Stream.maintain(s, base, s"$root/hist",
      Seq("id"), Seq("v"), s"$root/ckpt")
    refresh() // bootstrap at v0

    DataSkipping.deleteWhere(s, base, col("id") < 10L)                 // v1
    DataSkipping.updateWhere(s, base, col("id") === 100L,
      Map("v" -> lit("updated")))                                       // v2
    DataSkipping.mergeUpsert(s, base,
      Seq((100L, "merged"), (9000L, "new")).toDF("id", "v"), Seq("id")) // v3
    refresh()

    val h = hist(root)
    // untouched key: one open row from the bootstrap
    assert(h((50L, 0L)) === (("v50", None)))
    // deleted key: closed at the delete's commit version, no successor
    assert(h((5L, 0L)) === (("v5", Some(1L))))
    assert(!h.keys.exists(k => k._1 == 5L && k._2 > 0L))
    // updated-then-merged key: three tiles [0,2) [2,3) [3,)
    assert(h((100L, 0L)) === (("v100", Some(2L))))
    assert(h((100L, 2L)) === (("updated", Some(3L))))
    assert(h((100L, 3L)) === (("merged", None)))
    // merge-inserted key: born at v3
    assert(h((9000L, 3L)) === (("new", None)))

    // the standing invariant: open rows == live base state
    val open = Scd2Stream.readCurrent(s, s"$root/hist", Seq("id"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val live = DataSkipping.readSkipping(s, base, lit(true))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(open === live)

    // idle refresh: no new history generations
    val gens = DataSkipping.tableVersions(s, s"$root/hist").size
    refresh()
    assert(DataSkipping.tableVersions(s, s"$root/hist").size === gens,
      "an idle refresh must not commit")
  }

  test("delete then re-insert leaves a version gap; DV DML drives the feed identically") {
    val s = spark
    import s.implicits._
    val root = tmpDir("scd2s_gap")
    val base = s"$root/base"
    build(s, base)
    def refresh() = Scd2Stream.maintain(s, base, s"$root/hist",
      Seq("id"), Seq("v"), s"$root/ckpt")
    refresh()
    DataSkipping.deleteWhereDV(s, base, col("id") === 7L)               // v1
    DataSkipping.mergeUpsert(s, base,
      Seq((7L, "reborn")).toDF("id", "v"), Seq("id"))                   // v2
    refresh()
    val h = hist(root)
    assert(h((7L, 0L)) === (("v7", Some(1L))))
    assert(h((7L, 2L)) === (("reborn", None)),
      "the [1,2) gap IS the deletion")
  }

  test("crash window: a batch whose replace committed but whose offset didn't replays as a no-op") {
    val s = spark
    import s.implicits._
    val root = tmpDir("scd2s_crash")
    val base = s"$root/base"
    build(s, base)
    Scd2Stream.maintain(s, base, s"$root/hist", Seq("id"), Seq("v"),
      s"$root/ckpt")
    DataSkipping.deleteWhere(s, base, col("id") === 3L)                 // v1
    val batch = DataSkipping.readChangeFeed(s, base, 1L, Some(1L))
    Scd2Stream.foldBatch(s, s"$root/hist", Seq("id"), Seq("v"), batch,
      batchId = 1L, checkpoint = s"$root/ckpt")
    val after = hist(root)
    assert(after((3L, 0L))._2 === Some(1L))
    val gens = DataSkipping.tableVersions(s, s"$root/hist").size
    // replay with the SAME batchId: detected no-op, no new commit
    Scd2Stream.foldBatch(s, s"$root/hist", Seq("id"), Seq("v"), batch,
      batchId = 1L, checkpoint = s"$root/ckpt")
    assert(hist(root) === after)
    assert(DataSkipping.tableVersions(s, s"$root/hist").size === gens)
  }

  test("fold plan shape: affected keys ride broadcast joins, never a collected key IN literal") {
    val s = spark
    import s.implicits._
    val root = tmpDir("scd2s_shape")
    val base = s"$root/base"
    build(s, base)
    Scd2Stream.maintain(s, base, s"$root/hist", Seq("id"), Seq("v"),
      s"$root/ckpt")
    DataSkipping.deleteWhere(s, base, col("id") < 40L) // v1

    val executed = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val optimized = new java.util.concurrent.CopyOnWriteArrayList[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        executed.add(qe.executedPlan.toString)
        optimized.add(qe.optimizedPlan)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      Scd2Stream.maintain(s, base, s"$root/hist", Seq("id"), Seq("v"),
        s"$root/ckpt") // folds v1
      val deadline = System.currentTimeMillis() + 15000
      def hasBroadcastSemi = executed.toArray.exists { p =>
        val str = p.toString
        str.contains("BroadcastHashJoin") && str.contains("LeftSemi")
      }
      while (!hasBroadcastSemi && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(hasBroadcastSemi,
        "affected history rows must come via a broadcast semi-join")
      // no fold plan may carry a collected history-KEY IN literal
      // (file-list INs from manifest handling are the accepted
      // Delta-snapshot pattern and exempt)
      import org.apache.spark.sql.catalyst.expressions.{In, InSet}
      optimized.forEach { plan =>
        plan.foreach(_.expressions.foreach(_.foreach {
          case i: In if i.value.references.exists(_.name == "id") =>
            fail(s"collected key IN literal in fold plan: $i")
          case i: InSet if i.child.references.exists(_.name == "id") =>
            fail(s"collected key INSET literal in fold plan: $i")
          case _ => ()
        }))
      }
    } finally s.listenerManager.unregister(listener)
  }
}
