package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cardinality sketching — the approximate-aggregate rung the exact
  * operators can't take at 100 TB: COUNT(DISTINCT user_id) over a
  * petabyte of events shuffles every distinct value; a HyperLogLog
  * sketch shuffles 2^p 8-byte rows per group, period.
  */
object Sketches {

  /** rho is clamped here so the exact scaled accumulator
    * `T = Σ 2^(RhoCap − M_b)` fits a long for every p ≤ 16
    * (m·2^RhoCap ≤ 2^57); the clamp fires with probability 2^−41 —
    * unobservable below ~10^12 distinct values per bucket.
    */
  val RhoCap = 41

  /** Grouped HyperLogLog approximate distinct count (Flajolet et al.
    * 2007), built ENTIRELY from partial-aggregated composition — no
    * custom aggregate state, no sketch blob:
    *
    *  1. hash each value with the oracle-replayable 60-bit
    *     polynomial hash ([[Hashing.poly60]]) and run it through the
    *     codegen'd splitmix64 finalizer
    *     ([[graft.plans.Mix64]]) — polynomial hashes are AFFINE in
    *     their input (fine for equality bucketing, useless for a
    *     sketch that reads bit positions; without the avalanche the
    *     estimate collapses to alpha·m);
    *  2. bucket = top p bits of the mixed hash; rho = 1 +
    *     leading-zero count of the remaining bits, computed EXACTLY
    *     via binary-string length (`floor(log2)` in doubles rounds
    *     2^k−1 neighborhoods — the classic trap), clamped at
    *     [[RhoCap]];
    *  3. `groupBy(group, bucket).max(rho)` — the sketch IS this
    *     frame; max is Spark's partial-aggregated merge, so the
    *     shuffle carries ≤ 2^p 8-byte rows per group whatever the
    *     input size or skew;
    *  4. fold buckets to the raw HLL estimate
    *     `alpha_m · m² / Σ 2^−M_b` with the sum carried as the
    *     EXACT scaled long `T = Σ 2^(RhoCap − M_b)` (empty buckets
    *     contribute 2^RhoCap), so the only floating-point step is
    *     one final multiply/divide — the estimate is bit-identical
    *     across engines, partitionings and fold orders.
    *
    * The RAW estimate is emitted deliberately: HLL's small-range
    * linear-counting correction needs `ln`, which is libm-dependent
    * cross-engine (the lmFamiliarity lesson) — callers in the raw
    * regime (n ≳ 2.5·m) lose nothing, and the exact `hll_t_scaled`
    * rides in the output for any downstream correction.
    *
    * Output: (groupCols..., hll_buckets_used, hll_t_scaled,
    * approx_distinct). Standard error ≈ 1.04/√(2^p).
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 12): DataFrame =
    estimate(sketch(df, groupCols, valueCol, p), groupCols, p)

  /** The MERGEABLE sketch state: one (groupCols..., hll_bucket,
    * hll_rho) row per non-empty bucket — at most 2^p rows per group.
    * This frame is the HLL register array in relational form: union
    * two states (same p) and re-[[merge]] to sketch the union of the
    * underlying sets without revisiting either input — persist it as
    * a stats table and tomorrow's batch folds in with one
    * `groupBy.max`. Every step is a partial aggregate.
    */
  def sketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 12): DataFrame = {
    val (bucket, rho) = registerColumns(col(valueCol), p)
    // COUNT(DISTINCT) ignores NULLs; without this filter a NULL value
    // row would form a phantom register (bucket=NULL — least() skips
    // the null operand, leaving rho=RhoCap) that both counts in
    // hll_buckets_used and drops one empty-bucket term from
    // hll_t_scaled, inflating the estimate
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ bucket.as("hll_bucket"): _*)
      .agg(max(rho).as("hll_rho"))
  }

  /** The per-row (bucket, rho) register expressions — the reusable
    * half of [[sketch]] for callers that own their own grouping
    * (e.g. [[graft.streaming.WindowedDistinct]]'s event-time
    * windows, where the window expression must sit in the SAME
    * single streaming aggregation). CALLERS MUST pre-filter
    * `value IS NOT NULL` rows (as [[sketch]] does) — a NULL value
    * yields a phantom NULL-bucket register that inflates the
    * estimate, where COUNT(DISTINCT) would have ignored the row.
    */
  def registerColumns(value: org.apache.spark.sql.Column,
      p: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    require(p >= 7 && p <= 16, s"p must be in [7, 16]: $p") // m >= 128: single-alpha regime
    val wbits = 64 - p
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    val z = call_function("graft_mix64", Hashing.poly60(value.cast("string")))
    val bucket = shiftrightunsigned(z, wbits)
    val w = z.bitwiseAND(lit((1L << wbits) - 1))
    // exact floor(log2(w)) = len(binary(w)) - 1; rho = lz + 1
    val rho = least(lit(RhoCap),
      when(w === 0L, lit(RhoCap))
        .otherwise(lit(wbits) - (length(conv(w.cast("string"), 10, 2)) - 1)))
    (bucket, rho)
  }

  /** Merge any number of unioned sketch states (all built at the
    * same p): bucket-wise max — HLL's lossless register merge.
    */
  def merge(states: DataFrame, groupCols: Seq[String]): DataFrame =
    states.groupBy(groupCols.map(col) :+ col("hll_bucket"): _*)
      .agg(max(col("hll_rho")).as("hll_rho"))

  /** INCREMENTAL sketch maintenance: fold one batch's registers into
    * a persisted sketch stats table — "distinct users ever seen, per
    * group" maintained at O(batch + touched registers) per fold,
    * never O(history). First call bootstraps the table (stats
    * tracked on the merge keys, so the conditional MERGE prunes to
    * the touched register files); every later call is ONE
    * [[graft.sources.DataSkipping.mergeInto]] whose matched-update
    * clause applies the lossless register merge
    * (`s.hll_rho > t.hll_rho` → take the source's) and whose
    * not-matched clause inserts fresh registers. A register the
    * batch cannot raise rewrites nothing — steady state touches a
    * shrinking file set. `txn` gives Delta-style replay idempotency
    * (the foreachBatch crash window); the estimate after any fold
    * sequence is BIT-IDENTICAL to sketching all inputs at once
    * (max is associative/commutative/idempotent).
    */
  def foldSketch(spark: org.apache.spark.sql.SparkSession,
      sketchTable: String, batch: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 12,
      txn: Option[(String, Long)] = None): Unit = {
    import graft.sources.{DataSkipping, MergeClause}
    val batchSketch = sketch(batch, groupCols, valueCol, p)
    val fs = new org.apache.hadoop.fs.Path(sketchTable)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = groupCols :+ "hll_bucket"
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        s"$sketchTable/${DataSkipping.StatsDir}")))
      DataSkipping.writeWithStats(batchSketch, sketchTable, keys)
    else
      DataSkipping.mergeInto(spark, sketchTable, batchSketch, keys, Seq(
        MergeClause.MatchedUpdate(
          Some(col("s.hll_rho") > col("t.hll_rho")),
          Map("hll_rho" -> col("s.hll_rho"))),
        MergeClause.NotMatchedInsert(None)), txn = txn)
  }

  /** The maintained sketch table's current estimates. */
  def readSketchEstimate(spark: org.apache.spark.sql.SparkSession,
      sketchTable: String, groupCols: Seq[String], p: Int): DataFrame =
    estimate(graft.sources.DataSkipping.readSkipping(spark, sketchTable,
      col("hll_bucket").isNotNull || col("hll_bucket").isNull),
      groupCols, p)

  /** Fold a sketch state to the raw HLL estimate (see
    * [[approxDistinct]] for the arithmetic and determinism story).
    */
  def estimate(state: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 7 && p <= 16, s"p must be in [7, 16]: $p")
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("hll_buckets_used"),
        sum(pow(lit(2.0), lit(RhoCap) - col("hll_rho")).cast("long")).as("__t_p"))
      .select(groupCols.map(col) :+ col("hll_buckets_used") :+
        (col("__t_p") +
          (lit(m.toLong) - col("hll_buckets_used")) * lit(1L << RhoCap))
          .as("hll_t_scaled"): _*)
      .withColumn("approx_distinct",
        lit(alpha * m.toDouble * m.toDouble * (1L << RhoCap).toDouble) /
          col("hll_t_scaled").cast("double"))
  }
}
