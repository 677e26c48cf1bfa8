package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Current-state (inventory-style) computation.
  *
  * Re-expresses the reference's gold query
  * (pos-dlt `04_Silver-to-Gold ETL.sql:70-103`):
  *   latest_inventory_snapshot a
  *   LEFT OUTER JOIN (changes x dims, with a NOT(online AND bopis)
  *   exclusion) b ON a.keys = b.keys AND a.date_time <= b.date_time
  *   GROUP BY keys ->
  *     FIRST(a.quantity), COALESCE(SUM(b.quantity),0),
  *     snapshot+delta, GREATEST(timestamps)
  *
  * Scale design:
  *  - The snapshot side is already latest-per-key (bounded by key
  *    cardinality), so it is the SMALL side; the change stream is the
  *    100 TB side. The join is an equi-join on the key columns with
  *    the `snapTs <= chgTs` range predicate attached as a residual
  *    join condition — Catalyst plans a hash/sort-merge join on the
  *    equi keys, never a cartesian.
  *  - The exclusion dim join is a broadcast.
  *  - Measures are aggregated as DECIMAL so results are exact and
  *    independent of partial-aggregation order.
  */
object Inventory {

  val dec: DecimalType = DecimalType(12, 2)
  val decWide: DecimalType = DecimalType(18, 2)

  /** Generic current-state: snapshots (one row per key) + later
    * deltas.
    *
    * @param snapshot one row per key: keys ++ (seqCol, qtyCol)
    * @param changes  delta rows: keys ++ (seqCol, qtyCol)
    */
  def currentState(
      snapshot: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      qtyCol: String): DataFrame = {
    val a = snapshot.select(
      keys.map(col) :+ col(seqCol).as("__snap_ts") :+ col(qtyCol).cast(dec).as("__snap_qty"): _*)
    val b = changes.select(
      keys.map(col) :+ col(seqCol).as("__chg_ts") :+ col(qtyCol).cast(dec).as("__chg_qty"): _*)
      .withColumnsRenamed(keys.map(k => k -> s"__b_$k").toMap)
    val joinCond = keys.map(k => a(k) === b(s"__b_$k")).reduce(_ && _) &&
      (a("__snap_ts") <= b("__chg_ts"))
    val snapQ = min(col("__snap_qty"))
    val chgQ = coalesce(sum(col("__chg_qty")), lit(0)).cast(decWide)
    a.join(b, joinCond, "left_outer")
      .groupBy(keys.map(a(_)): _*)
      .agg(
        snapQ.cast("double").as("snapshot_quantity"),
        chgQ.cast("double").as("change_quantity"),
        (snapQ + chgQ).cast("double").as("current_inventory"),
        greatest(min(col("__snap_ts")), max(col("__chg_ts"))).as("date_time"))
  }

  /** The flagship query over the `events` table, preserving every
    * semantic element of the reference gold query:
    *  - snapshot  = latest `signup` event per user (CDC latest-by-key)
    *  - changes   = events joined to a broadcast change-type dim,
    *                keeping only tracked types (the NOT(online AND
    *                bopis) analog), at-or-after the snapshot
    *  - output    = snapshot qty + sum(deltas), GREATEST(timestamps)
    */
  def currentInventoryOverEvents(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val changeTypes = Seq(
      ("purchase", 1), ("click", 1), ("view", 1), ("error", 0), ("signup", 0)
    ).toDF("event_type", "tracked")

    val snapshot = Cdc.latestByKey(
      events.filter($"event_type" === "signup"),
      keys = Seq("user_id"), seqCols = Seq("ts", "event_id"), payload = Seq("value"))

    val changes = events
      .join(broadcast(changeTypes.filter($"tracked" === 1)), Seq("event_type"))
      .select($"user_id", $"ts", $"value")

    currentState(snapshot, changes, keys = Seq("user_id"), seqCol = "ts", qtyCol = "value")
      .orderBy("user_id")
  }
}
