package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * A fact⋈fact join on the same keys normally shuffles BOTH sides
  * every run. Writing each side bucketed (and sorted) by the join
  * key pins rows to hash buckets at write time, so every later join
  * or aggregation on that key runs shuffle-free — at 100 TB that
  * converts the recurring dominant cost into a one-time write cost.
  * Bucket counts must match on both sides (Spark also accepts
  * multiples when `spark.sql.sources.bucketing.enabled` and
  * coalescing are on).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table at `path`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
