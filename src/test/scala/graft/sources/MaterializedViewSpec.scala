package graft.sources

import graft.SparkSpec
import graft.streaming.IncrementalView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** Automatic materialized-view answering ([[GraftMvRewrite]] +
  * [[MaterializedViews]]): a fresh maintained view silently answers a
  * matching grouped aggregate; ANY base commit after the last refresh
  * — or any shape/type the view cannot prove exact — falls back to
  * the base scan. Correctness is always compared against a direct
  * recompute over the live base table, so a wrong rewrite (stale
  * serve, lossy cast, missed tombstone) fails on values, not just on
  * plan shape.
  */
class MaterializedViewSpec extends SparkSpec {

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => a
    }.nonEmpty

  private def baseDf(n: Long) = {
    import spark.implicits._
    spark.range(0, n).select(col("id"),
      concat(lit("g"), pmod(col("id"), lit(7))).as("g"),
      (col("id") * 3 + 1).as("v"))
  }

  private def recompute(base: String) =
    DataSkipping.readSkipping(spark, base, col("id").isNotNull)
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("g").collect().toSeq

  test("fresh sum/count view answers the aggregate; any base commit falls back") {
    val root = tmpDir("graft_mv1")
    val base = s"$root/base"; val view = s"$root/view"
    DataSkipping.writeWithStats(baseDf(1000).repartition(4), base,
      statsCols = Seq("id"), bloomCols = Nil, changeFeed = true)
    IncrementalView.maintainSumCount(spark, base, view, "g", "v",
      s"$root/ckpt")

    def query() = spark.read.format("graft").load(base)
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("g")

    // fresh right after the bootstrap drain: rewrite fires (the
    // Aggregate disappears — the view scan needs none) and values
    // match a direct recompute exactly
    val fresh = query()
    assert(!hasAggregate(fresh), "fresh view must answer the aggregate")
    assert(fresh.collect().toSeq == recompute(base))

    // one DML on the base: stale -> the SAME query silently reverts
    // to the base aggregate and reflects the new state
    DataSkipping.deleteWhere(spark, base, col("id") % 5 === 0)
    val stale = query()
    assert(hasAggregate(stale), "stale view must never answer")
    assert(stale.collect().toSeq == recompute(base))

    // refresh folds the delete -> fresh again, including a
    // group-migrating merge in the next round trip
    IncrementalView.maintainSumCount(spark, base, view, "g", "v",
      s"$root/ckpt")
    DataSkipping.mergeUpsert(spark, base,
      baseDf(1000).filter(col("id") % 9 === 2)
        .withColumn("g", lit("migrated")),
      Seq("id"))
    IncrementalView.maintainSumCount(spark, base, view, "g", "v",
      s"$root/ckpt")
    val refreshed = query()
    assert(!hasAggregate(refreshed))
    assert(refreshed.collect().toSeq == recompute(base))
  }

  test("grouping-only, partial-output and ordered shapes rewrite too") {
    val root = tmpDir("graft_mv2")
    val base = s"$root/base"; val view = s"$root/view"
    DataSkipping.writeWithStats(baseDf(600).repartition(4), base,
      statsCols = Seq("id"), bloomCols = Nil, changeFeed = true)
    IncrementalView.maintainSumCount(spark, base, view, "g", "v",
      s"$root/ckpt")
    val rel = spark.read.format("graft").load(base)
    // sum-only aggregate list (groupBy always carries the key)
    val sums = rel.groupBy("g").agg(sum("v").as("s")).orderBy("g")
    assert(!hasAggregate(sums))
    assert(sums.collect().map(_.getLong(1)).toSeq ==
      recompute(base).map(_.getLong(1)))
    // DISTINCT g == grouping-only aggregate: the view's live group
    // set IS the base's group set (tombstones filtered)
    val distinct = rel.select("g").distinct()
    assert(!hasAggregate(distinct))
    assert(distinct.collect().map(_.getString(0)).sorted.toSeq ==
      recompute(base).map(_.getString(0)))
  }

  test("min/max view: formula + recompute folds stay exact through the rewrite") {
    val root = tmpDir("graft_mv3")
    val base = s"$root/base"; val view = s"$root/view"
    DataSkipping.writeWithStats(baseDf(800).repartition(4), base,
      statsCols = Seq("id"), bloomCols = Nil, changeFeed = true)
    IncrementalView.maintainMinMax(spark, base, view, "g", "v",
      s"$root/ckpt")
    // delete every group's current minimum band -> the recompute path
    DataSkipping.deleteWhere(spark, base, col("v") < 90L)
    IncrementalView.maintainMinMax(spark, base, view, "g", "v",
      s"$root/ckpt")
    val q = spark.read.format("graft").load(base)
      .groupBy("g").agg(min("v").as("lo"), max("v").as("hi"),
        count(lit(1)).as("c"))
      .orderBy("g")
    assert(!hasAggregate(q))
    val expect = DataSkipping.readSkipping(spark, base, col("id").isNotNull)
      .groupBy("g").agg(min("v").as("lo"), max("v").as("hi"),
        count(lit(1)).as("c"))
      .orderBy("g").collect().toSeq
    assert(q.collect().toSeq == expect)
    // a sum is OUTSIDE the min_max vocabulary -> base aggregate
    assert(hasAggregate(spark.read.format("graft").load(base)
      .groupBy("g").agg(sum("v").as("s"))))
  }

  test("inexact value columns and versioned reads never serve") {
    val root = tmpDir("graft_mv4")
    val base = s"$root/base"; val view = s"$root/view"
    DataSkipping.writeWithStats(
      baseDf(300).withColumn("v", col("v").cast("double") + 0.1234567)
        .repartition(2),
      base, statsCols = Seq("id"), bloomCols = Nil, changeFeed = true)
    // the view is still maintained and readable...
    val served = IncrementalView.maintainSumCount(spark, base, view,
      "g", "v", s"$root/ckpt")
    assert(served.count() == 7)
    // ...but a double column's decimal fold is not bit-identical to
    // the base sum, so the aggregate must keep the base scan
    assert(hasAggregate(spark.read.format("graft").load(base)
      .groupBy("g").agg(sum("v").as("s"))))

    val root2 = tmpDir("graft_mv5")
    val base2 = s"$root2/base"
    DataSkipping.writeWithStats(baseDf(300).repartition(2), base2,
      statsCols = Seq("id"), bloomCols = Nil, changeFeed = true)
    IncrementalView.maintainSumCount(spark, base2, s"$root2/view", "g", "v",
      s"$root2/ckpt")
    val v0 = DataSkipping.tableVersions(spark, base2).max
    // a time-travel read asks for a PINNED version; the view tracks
    // the live table and must not answer for it
    assert(hasAggregate(spark.read.format("graft")
      .option("versionAsOf", v0.toString).load(base2)
      .groupBy("g").agg(sum("v").as("s"))))
    // filters under the aggregate mean a subset of the base: no serve
    assert(hasAggregate(spark.read.format("graft").load(base2)
      .filter(col("id") > 100L)
      .groupBy("g").agg(sum("v").as("s"))))
    // avg is outside every kind's vocabulary
    assert(hasAggregate(spark.read.format("graft").load(base2)
      .groupBy("g").agg(avg("v").as("a"))))
  }

  test("attach re-registers a self-describing view in a cold registry") {
    val root = tmpDir("graft_mv6")
    val base = s"$root/base"; val view = s"$root/view"
    DataSkipping.writeWithStats(baseDf(500).repartition(3), base,
      statsCols = Seq("id"), bloomCols = Nil, changeFeed = true)
    IncrementalView.maintainSumCount(spark, base, view, "g", "v",
      s"$root/ckpt")
    val before = recompute(base)
    MaterializedViews.clear()
    // cold registry: correct but unserved
    assert(hasAggregate(spark.read.format("graft").load(base)
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"))))
    val spec = MaterializedViews.attach(spark, view)
    assert(spec.groupCol == "g" && spec.valueCol == "v" &&
      spec.kind == "sum_count")
    val q = spark.read.format("graft").load(base)
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("g")
    assert(!hasAggregate(q))
    assert(q.collect().toSeq == before)
  }
}
