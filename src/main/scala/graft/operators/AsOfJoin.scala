package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the
  * greatest `rightTs <= leftTs` within the same keys — "the price in
  * effect at order time", "the latest signup before this purchase",
  * the snapshot-at-transaction-time coordination the reference's
  * gold query does inline (pos-dlt `04_Silver-to-Gold ETL.sql:70-103`
  * restricts snapshots to `date_time <= first(...)`), generalized to
  * a reusable operator.
  *
  * Shape: ONE equi-shuffle join on `keys` (the range predicate is a
  * residual filter inside each key group — hash/SMJ, never a
  * cartesian), then ONE partial-aggregated `max(struct)` collapses
  * each left row's candidate fan-out to its latest match. No window
  * over the joined relation. The fan-out before the aggregate is
  * bounded by right-rows-per-key; if a single key's right side is
  * huge AND unbounded in time, pre-bucket `right` by coarse time
  * range and join on (keys, bucket) — same operator, composed.
  */
object AsOfJoin {

  /** Latest right row at or before each left row.
    *
    * @param keys      equi-join keys present on both sides
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column (must not collide with
    *                  a left column name; output keeps it as
    *                  `asof_ts`)
    * @param payload   right columns carried to the output (null when
    *                  no right row is at or before the left row)
    * @param tieBreak  right column ordering equal timestamps
    *                  (greatest wins); REQUIRED for a deterministic
    *                  result when (keys, rightTs) is not unique
    *
    * Left rows must be pairwise distinct (they are the group key);
    * carry a unique id column if they may repeat. By default a
    * violation SILENTLY collapses the duplicates to one output row;
    * set `checkUniqueLeft = true` to instead fail with the first
    * offending row. The check is one extra aggregation over `left`
    * (bounded: only a single sample row reaches the driver) — turn
    * it on in tests/first runs, off in the steady-state hot path.
    */
  def latestAtOrBefore(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String], tieBreak: Option[String] = None,
      checkUniqueLeft: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one key")
    if (checkUniqueLeft) {
      val dup = left.groupBy(left.columns.map(col): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalArgumentException(
          "left rows must be pairwise distinct (they are the as-of group " +
            s"key) — duplicate row found: ${dup.head}. Carry a unique id " +
            "column on the left, or deduplicate upstream.")
    }
    require(rightTs != leftTs && !left.columns.contains(rightTs),
      s"right ts column '$rightTs' collides with a left column — rename it upstream")
    require(!left.columns.contains("asof_ts") && !left.columns.contains("__m"),
      "left already has an 'asof_ts'/'__m' column (chained as-of join?) — " +
        "rename it upstream or the output would carry duplicate names")
    val tb = tieBreak.toSeq
    val rightCarry = ((rightTs +: tb) ++ payload).distinct
    require(rightCarry.forall(c => !left.columns.contains(c)),
      "right payload columns collide with left columns — rename upstream")
    val kRenamed = keys.map(k => s"__rk_$k")
    val r = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++ rightCarry.map(col): _*)
    val cond = keys.zip(kRenamed).map { case (k, rk) => col(k) === col(rk) }
      .reduce(_ && _) && col(rightTs) <= col(leftTs)
    val leftCols = left.columns.toSeq
    val ordered = col(rightTs).as("asof_ts") +: (tb ++ payload).distinct.map(col)
    left.join(r, cond, "left")
      .groupBy(leftCols.map(col): _*)
      .agg(max(struct(ordered: _*)).as("__m"))
      .select(leftCols.map(col) ++
        (col("__m.asof_ts").as("asof_ts") +: payload.map(p => col(s"__m.$p").as(p))): _*)
  }
}
