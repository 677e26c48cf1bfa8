package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffle joins.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one join key dwarfs everything
  * (e.g. a null-ish default key holding 10% of 100 TB): the big
  * side's rows are spread across `saltBuckets` sub-keys, and the
  * small side is replicated once per bucket, so the hot key's rows
  * land on `saltBuckets` reducers instead of one.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted. The salt on the big
    * side is derived from xxhash64 of the whole row's partition
    * position (uniform across buckets); the small side is exploded
    * `saltBuckets` times. Result equals the plain inner join
    * row-for-row.
    *
    * CAVEAT — salt is NOT deterministic across task retries:
    * `monotonically_increasing_id` depends on partition layout and
    * row order, so a retried task may salt the same row differently.
    * Harmless HERE (every salt value matches the replicated small
    * side, so the join result is identical either way), but do not
    * reuse this salting pattern anywhere the salt value itself is
    * persisted, joined on across stages, or must be stable under
    * speculative execution — derive the salt from key/payload
    * columns there instead.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
