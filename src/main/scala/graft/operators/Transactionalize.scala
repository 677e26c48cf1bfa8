package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Transaction-document assembly.
  *
  * Re-expresses the reference's data-generation grouping
  * (pos-dlt `02_Data Generation.py:95-115`: item rows are packed into
  * `struct(item_id, quantity)`, `collect_list`-ed per transaction,
  * and serialized to JSON documents).
  *
  * Scale design: one shuffle on the grouping keys with partial
  * map-side collection; the list is sorted with `sort_array` so the
  * output is deterministic regardless of partitioning (a raw
  * `collect_list` order depends on task scheduling and must never be
  * exposed).
  */
object Transactionalize {

  /** Group `df` into one row per key set, with the `itemCols` packed
    * into a sorted array-of-structs column `items`, plus item count.
    */
  def assemble(df: DataFrame, keys: Seq[String], itemCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        sort_array(collect_list(struct(itemCols.map(col): _*))).as("items"),
        count(lit(1)).as("n_items"))

  /** Same, serialized to a JSON document column (the wire format the
    * reference transmits to its event hub).
    */
  def assembleJson(df: DataFrame, keys: Seq[String], itemCols: Seq[String]): DataFrame =
    assemble(df, keys, itemCols).withColumn("doc", to_json(struct(col("items"))))
}
