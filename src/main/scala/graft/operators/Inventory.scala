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

  /** PERIODIC SNAPSHOT fact table with forward fill — the
    * inventory-position-by-day surface the reference's gold layer
    * implies (pos-dlt `04_Silver-to-Gold ETL.sql`: current state =
    * snapshot + later deltas; this materializes that state AT EVERY
    * DAY): per key, one row per calendar day from the key's first
    * observation to the global end of data, carrying the LAST
    * observed value at or before that day (gap days repeat the prior
    * position — the standard periodic-snapshot semantics that makes
    * "inventory on any given day" a filter instead of an as-of
    * join).
    *
    * Day-collapse rule: the last event of the day wins, ties on the
    * timestamp break by highest value — one deterministic
    * `max(struct(ts, value))` partial aggregate.
    *
    * Scale shape: the day-collapse is ONE partial-aggregated shuffle
    * of the raw stream (the only pass over the big input); the day
    * grid explodes from the ALREADY-AGGREGATED per-key frame
    * (bounded by keys × days, the output size); the global end day
    * rides a 1-row broadcast cross join (never a collect); and the
    * forward fill is a `last(ignoreNulls)` window PARTITIONED BY
    * KEY — per-key state, no corpus-global ordering, the one window
    * shape that holds at 100 TB.
    *
    * Output: (keys..., day, quantity) — quantity non-null from each
    * key's first observation onward.
    */
  def dailySnapshots(
      df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "dailySnapshots needs at least one key column")
    val day = to_date(col(tsCol))
    val daily = df
      .groupBy(keys.map(col) :+ day.as("day"): _*)
      .agg(max(struct(col(tsCol), col(valueCol).as("__v"))).as("__last"))
      .select(keys.map(col) :+ col("day") :+
        col("__last.__v").as("__day_last"): _*)
    val end = df.agg(max(day).as("__end_day"))
    val grid = daily.groupBy(keys.map(col): _*)
      .agg(min(col("day")).as("__d0"))
      .crossJoin(broadcast(end))
      .select(keys.map(col) :+
        explode(sequence(col("__d0"), col("__end_day"))).as("day"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("day"))
    grid.join(daily, keys :+ "day", "left")
      .withColumn("quantity", last(col("__day_last"), ignoreNulls = true).over(w))
      .select(keys.map(col) :+ col("day") :+ col("quantity"): _*)
  }
}
