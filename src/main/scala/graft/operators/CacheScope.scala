package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Caller-accessible release handle for the intermediate frames a
  * dedup operator persists (minhash signatures, simhash signatures,
  * the exploded n-gram index).
  *
  * Those caches exist because both sides of a self-join (or several
  * downstream joins) re-read one expensive aggregate; without a
  * handle they stay resident until LRU eviction, session close, or a
  * blanket `spark.catalog.clearCache()` — which also evicts caches
  * the caller wants kept. Long-lived sessions invoking the operators
  * repeatedly should pass a scope and release it.
  *
  * Usage:
  * {{{
  *   val scope = new CacheScope
  *   val pairs = Dedup.simHashPairs(docs, "id", "text", scope = scope)
  *   pairs.write.parquet(out)   // materialize FIRST -
  *   scope.release()            // the result is lazy and re-reads
  *                              // the tracked caches until consumed
  * }}}
  *
  * The default (a fresh scope the caller never releases) preserves
  * the old behavior exactly.
  */
final class CacheScope {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist (memory, spill to disk) and track for [[release]]. */
  private[operators] def cache(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Unpersist every tracked frame. Call only after the operator's
    * RESULT has been materialized (written/collected): the result is
    * a lazy plan over these caches and would silently recompute its
    * inputs afterwards.
    */
  def release(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }
}
