package graft.operators

import graft.sources.DataSkipping
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension-driven file pruning for fact ⋈ dim joins on a stats
  * table — the "dynamic file pruning" optimization, library form.
  *
  * The problem at 100 TB: `fact.join(dim)` where `dim` is small and
  * selective (a handful of stores, one region's nations) scans the
  * ENTIRE fact table, because static predicate pushdown only sees
  * literals — the join keys live in another table. Partition-level
  * dynamic pruning (Spark's DPP) needs the fact physically
  * partitioned by the join key; most fact tables aren't, and
  * per-key directories don't scale to high-cardinality keys.
  *
  * The fix: evaluate the dim side FIRST (it's small — that's why
  * it's broadcastable), derive a key envelope from it, and hand that
  * envelope to the stats table's file-skipping planner as an
  * ordinary predicate. Files whose min/max range — and per-file
  * Bloom filter, when the fact is bloom-indexed on the key — admit
  * none of the dim's keys are never opened. On a fact clustered or
  * even loosely correlated with the key, a selective dim turns a
  * full scan into a few files; a bloom-indexed fact prunes even when
  * the key is scattered.
  *
  * Two envelope shapes, picked by dim cardinality:
  *  - ≤ `maxKeys` distinct keys: the exact key set, as `key IN
  *    (...)`. The skip planner turns each element into a min/max
  *    containment (+ bloom probe) term; the row-level residual
  *    compiles to an O(1) hash-set membership (Catalyst `InSet`).
  *    The per-file skip test is `range && OR(per-key terms)` — the
  *    cheap range cut short-circuits the OR for files outside the
  *    envelope, so manifest evaluation stays ~O(files) not
  *    O(files × keys).
  *  - more: the (min, max) range only — still kills everything
  *    outside the dim's key span, degrades gracefully to a full
  *    scan when the dim spans the fact (exactly when pruning cannot
  *    help anyone).
  *
  * The driver-side collect is bounded by `maxKeys + 1` rows of one
  * column — strictly smaller than the broadcast of `dim` the join
  * itself ships to every executor, so this adds no new scale
  * ceiling. (The alternative — a Catalyst rule injecting a runtime
  * subquery filter like Spark's `PlanDynamicPruningFilters` — buys
  * plan-level automation at the cost of executing the dim subquery
  * inside planning; the envelope here is the same filter, built
  * where the caller already knows which side is small.)
  *
  * Correctness: the envelope is IMPLIED by the join condition (a
  * fact row joining some dim row has a key the dim contains), so
  * conjoining it prunes no surviving row. Inner and left-semi joins
  * only — pruning the preserved side of an outer join would drop its
  * unmatched rows. Null fact keys never satisfy an equi-join, and
  * never pass the envelope: both drop them, consistently.
  */
object DynamicFilePruning {

  /** `readSkipping(factPath) ⋈ dim` with the dim's key envelope
    * pushed into file skipping, then a broadcast equi-join.
    *
    * @param factKey  fact join column — stats-tracked on the fact
    *                 table for pruning to bite (bloom-indexed is
    *                 better still); untracked columns still work,
    *                 the envelope just prunes nothing
    * @param extraPred additional fact predicate, pushed into the
    *                 same skipping pass (AND-composed)
    * @param joinType "inner" or "left_semi"
    * @param maxKeys  exact-set threshold; above it the envelope
    *                 falls back to the dim key range
    */
  def joinPruned(
      spark: SparkSession,
      factPath: String,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      joinType: String = "inner",
      extraPred: Column = lit(true),
      maxKeys: Int = 1000): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"joinPruned preserves only the pruned (fact) side's MATCHED " +
        s"rows — outer join types would lose unmatched rows: $joinType")
    val envelope = keyEnvelope(dim, dimKey, col(factKey), maxKeys)
    val fact = DataSkipping.readSkipping(spark, factPath,
      envelope && extraPred)
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), joinType)
  }

  /** The dim side's key envelope as a predicate on `factCol`:
    * `IN (exact key set)` when the dim has ≤ `maxKeys` distinct
    * non-null keys, `BETWEEN min AND max` otherwise, `false` for an
    * empty dim (every file prunes — the join is empty). Exposed so
    * callers composing their own scan (time travel, column-mapped
    * reads) can reuse the envelope construction.
    */
  def keyEnvelope(dim: DataFrame, dimKey: String, factCol: Column,
      maxKeys: Int): Column = {
    require(maxKeys > 0, s"maxKeys must be positive: $maxKeys")
    // one bounded job over the (small) dim: ≤ maxKeys+1 single-column
    // rows reach the driver — the +1 row is the overflow signal
    val keys = dim.select(col(dimKey)).na.drop().distinct()
      .limit(maxKeys + 1).collect().map(_.get(0))
    if (keys.isEmpty) lit(false)
    else if (keys.length <= maxKeys) factCol.isin(keys: _*)
    else {
      val bounds = dim.select(min(col(dimKey)).as("lo"), max(col(dimKey)).as("hi"))
        .collect().head
      factCol >= lit(bounds.get(0)) && factCol <= lit(bounds.get(1))
    }
  }
}
