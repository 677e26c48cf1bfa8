package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Binned point-in-interval range join.
  *
  * The batch complement of [[graft.streaming.StreamJoin]]'s
  * watermarked range joins and [[AsOfJoin]]'s latest-at-or-before:
  * every `points` row joined to every `intervals` row whose
  * `[start, end)` (or `[start, end]`) window contains the point —
  * with NO shared equi key. Naively that predicate is pure-theta, so
  * Spark plans BroadcastNestedLoopJoin (O(|P|·|I|) comparisons, and
  * an OOM once neither side fits in one executor) — the same trap
  * the reference's gold query avoids only because its non-equi join
  * carries a store/item equi key (pos-dlt `04_Silver-to-Gold
  * ETL.sql:70-103`).
  *
  * This operator manufactures the missing equi key: the domain is
  * cut into fixed-width bins, each interval is replicated to every
  * bin it overlaps, each point lands in exactly ONE bin, and the
  * range predicate becomes a residual filter inside a plain hash
  * equi-join on the bin id. Because a point belongs to a single bin,
  * a (point, interval) pair can meet in at most one bin — the result
  * needs NO post-join dedup (the property that makes this shape
  * cheaper than interval-interval overlap, where both sides fan
  * out). This is the "bin/bucket range join" Spark itself ships as a
  * hint-driven rewrite in some distributions and Flink/Kafka-streams
  * implement as window-bucketed joins; here it is an explicit
  * operator.
  *
  * 100 TB shape: ONE shuffle of each side keyed by an 8-byte bin id,
  * hash or sort-merge join, partial aggregation downstream untouched.
  * Interval replication factor is `len/binWidth + 1` — pick
  * `binWidth` near the TYPICAL interval length so the factor is ~2.
  * A pathological interval (length >> binWidth) would silently
  * explode the build side, so the fan-out is guarded: more than
  * `maxBinsPerInterval` bins fails the job loudly with the offending
  * row's bounds instead of shuffling a hidden cross product.
  *
  * Columns are integral (cast timestamps with `unix_micros` /
  * `unix_millis` upstream — exact longs on every engine); bin ids
  * use exact floor division (truncation-toward-zero `div` corrected
  * by `pmod`), so negative domains bin correctly and no
  * double-precision boundary can mis-bin a point.
  */
object RangeJoin {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** Exact floorDiv(c, w) for integral c: (c - pmod(c, w)) is an
    * exact multiple of w, so the division has no fractional part —
    * done in decimal so no long-range value can hit a double
    * rounding boundary.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast(LongType)

  /** Inner-join `points` to every `intervals` row whose window
    * contains the point.
    *
    * @param points    side with `pointCol` (each row in exactly one bin)
    * @param intervals side with `startCol`/`endCol`; replicated to
    *                  each overlapped bin
    * @param binWidth  bin size in the columns' native unit; choose
    *                  ~the typical interval length
    * @param endInclusive false = half-open `[start, end)` (the
    *                  streaming-window convention), true = closed
    * @param maxBinsPerInterval loud-failure guard on the replication
    *                  factor of a single interval
    *
    * Output: all point columns then all interval columns (names must
    * be disjoint — rename upstream, same rule as [[AsOfJoin]]).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long,
      endInclusive: Boolean = false,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collide = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collide.isEmpty,
      s"point/interval column names collide: $collide — rename upstream")
    Seq(points.schema(pointCol), intervals.schema(startCol),
        intervals.schema(endCol)).foreach { f =>
      require(integral.contains(f.dataType),
        s"range-join column ${f.name} must be integral (got ${f.dataType}) — " +
          "cast timestamps with unix_micros/unix_millis upstream")
    }
    require(!points.columns.contains("__pbin") && !intervals.columns.contains("__ibin"),
      "reserved column __pbin/__ibin already present")

    // Disjoint temp names + name-based resolution: both sides may
    // derive from the SAME base frame (self-range-join), where
    // dataframe-identity column references trip ambiguous-self-join
    // resolution.
    val p = points.withColumn("__pbin", floorDiv(col(pointCol).cast(LongType), binWidth))
    val binSpan = floorDiv(col(endCol).cast(LongType), binWidth) -
      floorDiv(col(startCol).cast(LongType), binWidth) + lit(1L)
    val i = intervals
      .withColumn("__bins",
        when(col(endCol) < col(startCol), array().cast("array<bigint>"))
          .when(binSpan > lit(maxBinsPerInterval.toLong), raise_error(concat(
            lit(s"range-join interval spans more than $maxBinsPerInterval bins of width $binWidth: ["),
            col(startCol), lit(", "), col(endCol), lit("] — widen binWidth or split the interval"))))
          .otherwise(sequence(
            floorDiv(col(startCol).cast(LongType), binWidth),
            floorDiv(col(endCol).cast(LongType), binWidth))))
      .withColumn("__ibin", explode(col("__bins")))
      .drop("__bins")
    val upper =
      if (endInclusive) col(pointCol) <= col(endCol) else col(pointCol) < col(endCol)
    p.join(i, col("__pbin") === col("__ibin") && col(pointCol) >= col(startCol) && upper)
      .drop("__pbin", "__ibin")
  }
}
