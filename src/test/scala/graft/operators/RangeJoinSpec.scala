package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("p_id"), col("i_id")).as[(Long, Long)].collect().toSet

  private def naive(p: DataFrame, i: DataFrame, endInclusive: Boolean): Set[(Long, Long)] = {
    val upper = if (endInclusive) col("p_us") <= col("i_end") else col("p_us") < col("i_end")
    pairs(p.join(i, col("p_us") >= col("i_start") && upper))
  }

  private def eventsPoints: DataFrame =
    Tables.events(spark, sf).select(
      col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))

  private def eventsIntervals(lenUs: Long): DataFrame =
    Tables.events(spark, sf).filter(col("event_type") === "purchase").select(
      col("event_id").as("i_id"), unix_micros(col("ts")).as("i_start"),
      (unix_micros(col("ts")) + lit(lenUs)).as("i_end"))

  test("binned join == naive theta join, bin width below/at/above interval length") {
    val p = eventsPoints
    val len = 600L * 1000 * 1000 // 10 min
    val i = eventsIntervals(len)
    val expectHalfOpen = naive(p, i, endInclusive = false)
    assert(expectHalfOpen.nonEmpty, "test must be non-vacuous")
    for (bw <- Seq(len / 7, len, len * 5)) {
      val got = pairs(RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", bw))
      assert(got === expectHalfOpen, s"binWidth=$bw")
    }
    val gotIncl = pairs(RangeJoin.pointInInterval(
      p, i, "p_us", "i_start", "i_end", len, endInclusive = true))
    assert(gotIncl === naive(p, i, endInclusive = true))
    // half-open vs closed genuinely differ only when a point sits
    // exactly on an end bound; synthesize one below instead of hoping.
  }

  test("boundary points: start included, end excluded (half-open) or included (closed)") {
    val p = Seq((1L, 100L), (2L, 199L), (3L, 200L), (4L, 99L)).toDF("p_id", "p_us")
    val i = Seq((10L, 100L, 200L)).toDF("i_id", "i_start", "i_end")
    assert(pairs(RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", 50L))
      === Set((1L, 10L), (2L, 10L)))
    assert(pairs(RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", 50L,
      endInclusive = true)) === Set((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("negative domain bins by floor, not truncation") {
    val p = (-6L to 6L).map(v => (v, v)).toDF("p_id", "p_us")
    val i = Seq((1L, -3L, 2L)).toDF("i_id", "i_start", "i_end")
    val got = pairs(RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", 4L))
    assert(got === (-3L until 2L).map(v => (v, 1L)).toSet)
  }

  test("empty interval (end < start) matches nothing; zero-length half-open matches nothing") {
    val p = Seq((1L, 5L)).toDF("p_id", "p_us")
    val i = Seq((1L, 9L, 3L), (2L, 5L, 5L)).toDF("i_id", "i_start", "i_end")
    assert(pairs(RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", 2L)).isEmpty)
    assert(pairs(RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", 2L,
      endInclusive = true)) === Set((1L, 2L)))
  }

  test("a pathological interval fails loudly instead of exploding the build side") {
    val p = Seq((1L, 5L)).toDF("p_id", "p_us")
    val i = Seq((1L, 0L, 100000L)).toDF("i_id", "i_start", "i_end")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, i, "p_us", "i_start", "i_end", 2L,
        maxBinsPerInterval = 100).collect()
    }
    assert(e.getMessage != null)
  }

  test("plan is an equi join on the bin id — no nested loop, no cartesian") {
    val df = RangeJoin.pointInInterval(
      eventsPoints, eventsIntervals(600L * 1000 * 1000),
      "p_us", "i_start", "i_end", 600L * 1000 * 1000)
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("column name collisions and non-integral columns are refused") {
    val p = Seq((1L, 5L)).toDF("p_id", "p_us")
    val colliding = Seq((1L, 3L, 9L)).toDF("p_id", "i_start", "i_end")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, colliding, "p_us", "i_start", "i_end", 2L)
    }
    val bad = Seq((1L, 3.0, 9.0)).toDF("i_id", "i_start", "i_end")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, bad, "p_us", "i_start", "i_end", 2L)
    }
  }
}
