package graft.streaming

import graft.sources.{DataSkipping, MaterializedViews}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained grouped-aggregate view over a stats
  * table — the materialized-view-maintenance pattern the change data
  * feed exists for: at 100 TB, re-aggregating the base table after
  * every DML batch is the cost being avoided; folding the feed's
  * signed deltas into a small keyed view costs O(changes), not
  * O(table).
  *
  * The view is itself a stats table keyed on the group column, so
  * downstream reads prune on it and the merge arithmetic reuses the
  * storage layer's own MERGE. Maintenance is a change-feed stream
  * ([[ChangeFeedSource]], which implements the AvailableNow-correct
  * multi-batch drain) drained with `Trigger.AvailableNow` into
  * `foreachBatch`: per batch, each change row contributes its value
  * with weight +1 (`insert` / `update_postimage`) or -1 (`delete` /
  * `update_preimage`), the per-group deltas re-aggregate with the
  * view's CURRENT rows for exactly the affected keys, and the result
  * MERGEs in as ONE atomic generation commit. A group-key-changing
  * UPDATE migrates between groups for free — the preimage debits the
  * old group, the postimage credits the new one. A group emptied by
  * deletes folds to a `(sum 0, cnt 0)` TOMBSTONE row: keeping the
  * fold a single DML op is what makes every crash point replay-safe
  * (a delete-then-merge pair has a torn middle state no replay can
  * distinguish), and the read surface filters `cnt != 0`, so
  * tombstones are invisible. Later credits to the group resume from
  * the tombstone exactly.
  *
  * Sums are DECIMAL (value cast to `(20,6)`, accumulated at
  * `(30,6)`): decimal arithmetic is exact and associative, so the
  * incrementally-maintained view is BIT-IDENTICAL to a full
  * recompute — a float sum would drift with fold order and make the
  * view unverifiable against its own definition.
  *
  * Exactly-once, at EVERY crash point:
  *  - The feed's version offsets live in `checkpoint`; a replayed
  *    micro-batch re-reads the same immutable versions under the
  *    SAME deterministic batch id.
  *  - The fold is IDEMPOTENT, not merely additive: each batch's
  *    MERGE carries `txn = (viewAppId, batchId)` — the Delta
  *    `txnAppId`/`txnVersion` shape — stamped into the view
  *    generation atomically with the merged rows
  *    ([[DataSkipping.TxnFile]]). A batch whose MERGE committed but
  *    whose offset commit was lost (foreachBatch's classic crash
  *    window) replays as a detected no-op inside
  *    [[DataSkipping.mergeUpsert]] itself.
  *  - The BOOTSTRAP aggregates the frozen snapshot
  *    `readSkippingAt(base, V)` of the CURRENT version V and pins the
  *    feed at `V + 1` (version boundaries make "exactly the changes
  *    after the snapshot" well-defined — no double-count window even
  *    if DML lands mid-bootstrap).
  *  Single maintainer per view, like all storage maintenance ops.
  *
  * Scale shape: nothing in the fold touches the driver beyond two
  * scalar envelope values — the delta is a distributed aggregate of
  * the batch, the view's affected rows are read via stats-pruned
  * scan (group-key envelope, O(1) driver data) plus a BROADCAST
  * semi-join against the delta's keys, and the new values come from
  * one hash re-aggregation of (current ∪ delta) — no key list is
  * ever collected, no `IN` literal enters any plan, no join keys a
  * 100 TB-scale group cardinality could overwhelm.
  */
object IncrementalView {

  private val SumType = DecimalType(30, 6)
  private val CastType = DecimalType(20, 6)

  /** Transaction app id stamped into the view's generations: scoped
    * to the (view, CHECKPOINT) pair — batch ids are checkpoint-local,
    * so a view re-pointed at a fresh checkpoint must start a fresh
    * watermark (a view-only id would compare the new checkpoint's
    * batch 0 against the old checkpoint's high watermark and silently
    * skip every fold while offsets keep committing — permanent data
    * loss). `private[streaming]` for the crash-window spec.
    */
  private[streaming] def viewAppId(viewTable: String, checkpoint: String): String =
    s"graft-incremental-view:$viewTable@$checkpoint"

  /** Bootstrap (first call) or incrementally refresh (every later
    * call) the `sum(valueCol)/count(*) GROUP BY groupCol` view of
    * `baseTable` at `viewTable`. The base table must have its change
    * feed enabled. Returns the view as a DataFrame (pruned-read
    * surface; zero-count tombstone groups are filtered out).
    */
  def maintainSumCount(spark: SparkSession, baseTable: String,
      viewTable: String, groupCol: String, valueCol: String,
      checkpoint: String,
      maxVersionsPerTrigger: Int =
        ChangeFeedSource.DefaultMaxVersionsPerTrigger): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(viewTable)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(DataSkipping.changeFeedEnabled(spark, baseTable),
      s"$baseTable has no change data feed — the view cannot be " +
        "maintained incrementally; enable it with writeWithStats(" +
        "changeFeed = true) or enableChangeFeed")
    val bootstrapped = fs.exists(new org.apache.hadoop.fs.Path(
      s"$viewTable/${DataSkipping.StatsDir}"))
    val startAfter: Long =
      if (bootstrapped) -1L // pin already resolved; option is ignored
      else {
        val v = DataSkipping.tableVersions(spark, baseTable)
          .maxOption.getOrElse(0L)
        val snap = DataSkipping.readSkippingAt(spark, baseTable, v,
          col(groupCol).isNotNull || col(groupCol).isNull)
        DataSkipping.writeWithStats(
          snap.groupBy(col(groupCol)).agg(
            sum(col(valueCol).cast(CastType)).cast(SumType).as("sum_value"),
            count(lit(1)).as("cnt")),
          viewTable, Seq(groupCol))
        v
      }
    val reader = spark.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", baseTable)
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
    val withStart =
      if (bootstrapped) reader
      else reader.option("startingVersion", (startAfter + 1).toString)
    // listed BEFORE the stream starts: AvailableNow's drain boundary
    // is captured at start, so every version visible here is folded
    // by the time the drain returns — vStart is a safe (possibly
    // conservative) freshness watermark to stamp afterwards
    val vStart = DataSkipping.tableVersions(spark, baseTable)
      .maxOption.getOrElse(0L)
    val q = withStart.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        FoldTimings.timed("ivm_sum_count", batchId) {
          foldBatch(spark, viewTable, groupCol, valueCol, batch, batchId,
            checkpoint)
        }
      }
      .start()
    q.awaitTermination()
    MaterializedViews.onMaintained(spark, MaterializedViews.MvSpec(
      baseTable, viewTable, groupCol, valueCol, "sum_count"), checkpoint, vStart)
    readView(spark, viewTable, groupCol)
  }

  /** The view's visible rows: stats-table pruned read minus the
    * zero-count tombstones dead groups leave behind (see class doc).
    */
  def readView(spark: SparkSession, viewTable: String,
      groupCol: String): DataFrame =
    DataSkipping.readSkipping(spark, viewTable,
      col(groupCol).isNotNull || col(groupCol).isNull)
      .filter(col("cnt") =!= 0L)

  /** Second-moment precision ladder: values square at (16,6) →
    * (33,12), accumulate at (38,12) — exact for any realistic value
    * domain, and exactness is what makes the fold order-free.
    */
  private val SqCastType = DecimalType(16, 6)
  private val SqSumType = DecimalType(38, 12)

  /** Incrementally-maintained MEAN/VARIANCE view — the second-moment
    * member of the invertible-aggregate family: variance folds under
    * deletes because it decomposes into (Σv, Σv², n), each a signed
    * sum. The view stores the EXACT decimal moments (never the
    * derived mean/variance — a stored double would accumulate fold-
    * order drift); readers derive mean = Σv/n and the population
    * variance Σv²/n − (Σv/n)² in double AT READ TIME from exact
    * inputs, so the derived values are bit-identical to a full
    * recompute. Same txn-stamped single-MERGE exactly-once fold,
    * tombstone, bootstrap-pin and broadcast-semi-join shape as
    * [[maintainSumCount]].
    */
  def maintainMeanVar(spark: SparkSession, baseTable: String,
      viewTable: String, groupCol: String, valueCol: String,
      checkpoint: String,
      maxVersionsPerTrigger: Int =
        ChangeFeedSource.DefaultMaxVersionsPerTrigger): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(viewTable)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(DataSkipping.changeFeedEnabled(spark, baseTable),
      s"$baseTable has no change data feed — the view cannot be " +
        "maintained incrementally; enable it with writeWithStats(" +
        "changeFeed = true) or enableChangeFeed")
    val bootstrapped = fs.exists(new org.apache.hadoop.fs.Path(
      s"$viewTable/${DataSkipping.StatsDir}"))
    val startAfter: Long =
      if (bootstrapped) -1L
      else {
        val v = DataSkipping.tableVersions(spark, baseTable)
          .maxOption.getOrElse(0L)
        val snap = DataSkipping.readSkippingAt(spark, baseTable, v,
          col(groupCol).isNotNull || col(groupCol).isNull)
        val sq = col(valueCol).cast(SqCastType)
        DataSkipping.writeWithStats(
          snap.groupBy(col(groupCol)).agg(
            sum(col(valueCol).cast(CastType)).cast(SumType).as("sum_value"),
            sum(sq * sq).cast(SqSumType).as("sum_sq"),
            count(lit(1)).as("cnt")),
          viewTable, Seq(groupCol))
        v
      }
    val reader = spark.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", baseTable)
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
    val withStart =
      if (bootstrapped) reader
      else reader.option("startingVersion", (startAfter + 1).toString)
    val vStart = DataSkipping.tableVersions(spark, baseTable)
      .maxOption.getOrElse(0L)
    val q = withStart.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        FoldTimings.timed("ivm_moments", batchId) {
          foldMomentsBatch(spark, viewTable, groupCol, valueCol, batch,
            batchId, checkpoint)
        }
      }
      .start()
    q.awaitTermination()
    MaterializedViews.onMaintained(spark, MaterializedViews.MvSpec(
      baseTable, viewTable, groupCol, valueCol, "moments"), checkpoint, vStart)
    readView(spark, viewTable, groupCol)
  }

  /** One moments micro-batch folded as ONE idempotent MERGE — the
    * [[foldBatch]] shape with a second signed accumulator for Σv².
    */
  private[streaming] def foldMomentsBatch(spark: SparkSession,
      viewTable: String, groupCol: String, valueCol: String,
      batch: DataFrame, batchId: Long, checkpoint: String): Unit = {
    val appId = viewAppId(viewTable, checkpoint)
    if (DataSkipping.txnVersion(spark, viewTable, appId).exists(_ >= batchId))
      return
    val debit = col(DataSkipping.ChangeTypeCol)
      .isin("delete", "update_preimage")
    val signedVal = when(debit, -col(valueCol).cast(CastType))
      .otherwise(col(valueCol).cast(CastType))
    val sq = col(valueCol).cast(SqCastType)
    val signedSq = when(debit, -(sq * sq)).otherwise(sq * sq)
    val delta = batch.groupBy(col(groupCol)).agg(
      sum(signedVal).cast(SumType).as("__d_sum"),
      sum(signedSq).cast(SqSumType).as("__d_sq"),
      sum(when(debit, -1L).otherwise(1L)).as("__d_cnt"),
      count(when(col(groupCol).isNull, lit(1))).as("__nulls"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one action: emptiness + envelope (see foldBatch)
      val env = delta.agg(min(col(groupCol)), max(col(groupCol)),
        sum(col("__nulls")), count(lit(1))).head()
      if (env.getLong(3) != 0L) {
        require(env.isNullAt(2) || env.getLong(2) == 0L,
          s"change batch carries ${env.getLong(2)} NULL $groupCol row(s) — " +
            "null group keys cannot be incrementally maintained")
        val inRange =
          col(groupCol).between(lit(env.get(0)), lit(env.get(1)))
        val current = DataSkipping.readSkipping(spark, viewTable, inRange)
          .join(broadcast(delta.select(col(groupCol))), Seq(groupCol),
            "left_semi")
        val merged = current
          .select(col(groupCol), col("sum_value").as("__d_sum"),
            col("sum_sq").as("__d_sq"), col("cnt").as("__d_cnt"))
          .unionByName(delta.drop("__nulls"))
          .groupBy(col(groupCol)).agg(
            sum(col("__d_sum")).cast(SumType).as("sum_value"),
            sum(col("__d_sq")).cast(SqSumType).as("sum_sq"),
            sum(col("__d_cnt")).as("cnt"))
        DataSkipping.mergeUpsert(spark, viewTable, merged, Seq(groupCol),
          txn = Some(appId -> batchId))
      }
    } finally delta.unpersist()
  }

  /** Incrementally-maintained `min(valueCol)/max(valueCol)/count(*)
    * GROUP BY groupCol` view — the NON-invertible-aggregate face of
    * materialized-view maintenance. Sums fold under deletes (signed
    * deltas); extrema don't: deleting the current minimum says
    * nothing about the NEW minimum. The classic IVM answer, used
    * here: per batch, a group's extrema are maintained by FORMULA
    * when the batch provably cannot have lowered them — inserts only
    * (`new_min = least(cur, ins_min)`), or deletes strictly INSIDE
    * the current (min, max) interval — and RECOMPUTED from the base
    * table only when a delete touches an extremum (`del_min <=
    * cur_min` or `del_max >= cur_max`). The recompute reads the base
    * AT THE BATCH'S END VERSION via [[DataSkipping.readSkippingAt]]
    * time travel — NOT the live table, which may already hold future
    * versions this stream hasn't folded (a lagging consumer
    * recomputing from the live state would leap ahead and then
    * double-fold) — pruned to exactly the affected groups
    * (stats-envelope + broadcast semi-join, the [[foldBatch]] shape).
    * Cost: O(changes) per batch plus O(rows of extremum-deleted
    * groups) on the rare recompute — never O(table). Needs the
    * batch's end version retained (the same retention contract the
    * feed itself has). Exactly-once via the identical txn-stamped
    * single-MERGE fold as [[maintainSumCount]]; same tombstone /
    * null-key / bootstrap rules.
    */
  def maintainMinMax(spark: SparkSession, baseTable: String,
      viewTable: String, groupCol: String, valueCol: String,
      checkpoint: String,
      maxVersionsPerTrigger: Int =
        ChangeFeedSource.DefaultMaxVersionsPerTrigger): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(viewTable)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(DataSkipping.changeFeedEnabled(spark, baseTable),
      s"$baseTable has no change data feed — the view cannot be " +
        "maintained incrementally; enable it with writeWithStats(" +
        "changeFeed = true) or enableChangeFeed")
    val bootstrapped = fs.exists(new org.apache.hadoop.fs.Path(
      s"$viewTable/${DataSkipping.StatsDir}"))
    val startAfter: Long =
      if (bootstrapped) -1L
      else {
        val v = DataSkipping.tableVersions(spark, baseTable)
          .maxOption.getOrElse(0L)
        val snap = DataSkipping.readSkippingAt(spark, baseTable, v,
          col(groupCol).isNotNull || col(groupCol).isNull)
        DataSkipping.writeWithStats(
          snap.groupBy(col(groupCol)).agg(
            min(col(valueCol).cast(CastType)).as("min_value"),
            max(col(valueCol).cast(CastType)).as("max_value"),
            count(lit(1)).as("cnt")),
          viewTable, Seq(groupCol))
        v
      }
    val reader = spark.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", baseTable)
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
    val withStart =
      if (bootstrapped) reader
      else reader.option("startingVersion", (startAfter + 1).toString)
    val vStart = DataSkipping.tableVersions(spark, baseTable)
      .maxOption.getOrElse(0L)
    val q = withStart.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        FoldTimings.timed("ivm_minmax", batchId) {
          foldMinMaxBatch(spark, baseTable, viewTable, groupCol, valueCol,
            batch, batchId, checkpoint)
        }
      }
      .start()
    q.awaitTermination()
    MaterializedViews.onMaintained(spark, MaterializedViews.MvSpec(
      baseTable, viewTable, groupCol, valueCol, "min_max"), checkpoint, vStart)
    readView(spark, viewTable, groupCol)
  }

  /** One min/max feed micro-batch folded as ONE idempotent MERGE —
    * see [[maintainMinMax]]. `private[streaming]` for the crash
    * window and recompute-path specs.
    */
  private[streaming] def foldMinMaxBatch(spark: SparkSession,
      baseTable: String, viewTable: String, groupCol: String,
      valueCol: String, batch: DataFrame, batchId: Long,
      checkpoint: String): Unit = {
    val appId = viewAppId(viewTable, checkpoint)
    if (DataSkipping.txnVersion(spark, viewTable, appId).exists(_ >= batchId))
      return
    val debit = col(DataSkipping.ChangeTypeCol)
      .isin("delete", "update_preimage")
    val v = col(valueCol).cast(CastType)
    val delta = batch.groupBy(col(groupCol)).agg(
      min(when(!debit, v)).as("__ins_min"),
      max(when(!debit, v)).as("__ins_max"),
      min(when(debit, v)).as("__del_min"),
      max(when(debit, v)).as("__del_max"),
      sum(when(debit, -1L).otherwise(1L)).as("__d_cnt"),
      max(col(DataSkipping.CommitVersionCol)).as("__max_ver"),
      count(when(col(groupCol).isNull, lit(1))).as("__nulls"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one action: emptiness + envelope (see foldBatch)
      val env = delta.agg(min(col(groupCol)), max(col(groupCol)),
        sum(col("__nulls")), max(col("__max_ver")), count(lit(1))).head()
      if (env.getLong(4) != 0L) {
        require(env.isNullAt(2) || env.getLong(2) == 0L,
          s"change batch carries ${env.getLong(2)} NULL $groupCol row(s) — " +
            "null group keys cannot be incrementally maintained")
        val endVersion = env.getLong(3)
        val inRange =
          col(groupCol).between(lit(env.get(0)), lit(env.get(1)))
        val current = DataSkipping.readSkipping(spark, viewTable, inRange)
          .join(broadcast(delta.select(col(groupCol))), Seq(groupCol),
            "left_semi")
        val joined = delta.join(current, Seq(groupCol), "left")
        val newCnt = coalesce(col("cnt"), lit(0L)) + col("__d_cnt")
        // a delete at-or-below the current min (or at-or-above the
        // max) invalidates the formula; null-valued deletes never do
        // (extrema ignore nulls). A NULL current extremum (group new
        // to the view, tombstoned, or all-null) with any valued
        // delete also recomputes — the batch may have inserted AND
        // deleted the would-be extremum within its own version span,
        // and there is no interval to prove the delete interior to
        val needRec = newCnt > 0L && (
          (col("__del_min").isNotNull &&
            (col("min_value").isNull ||
              col("__del_min") <= col("min_value"))) ||
          (col("__del_max").isNotNull &&
            (col("max_value").isNull ||
              col("__del_max") >= col("max_value"))))
        val recKeys = joined.filter(needRec).select(col(groupCol))
        val formula = joined.filter(!coalesce(needRec, lit(false)))
          .select(col(groupCol),
            when(newCnt === 0L, lit(null).cast(CastType))
              .otherwise(least(col("min_value"), col("__ins_min")))
              .as("min_value"),
            when(newCnt === 0L, lit(null).cast(CastType))
              .otherwise(greatest(col("max_value"), col("__ins_max")))
              .as("max_value"),
            newCnt.as("cnt"))
        // one action: emptiness + key envelope of the recompute set
        val kEnv = recKeys.agg(min(col(groupCol)), max(col(groupCol)),
          count(lit(1))).head()
        val recomputed =
          if (kEnv.getLong(2) == 0L) None
          else {
            val snap = DataSkipping.readSkippingAt(spark, baseTable,
                endVersion,
                col(groupCol).between(lit(kEnv.get(0)), lit(kEnv.get(1))))
              .join(broadcast(recKeys), Seq(groupCol), "left_semi")
              .groupBy(col(groupCol)).agg(
                min(col(valueCol).cast(CastType)).as("min_value"),
                max(col(valueCol).cast(CastType)).as("max_value"),
                count(lit(1)).as("cnt"))
            // a recompute group absent from the snapshot (shouldn't
            // happen if counts are consistent, but a lost row must
            // tombstone, not silently keep stale extrema)
            Some(recKeys.join(snap, Seq(groupCol), "left")
              .select(col(groupCol),
                col("min_value"), col("max_value"),
                coalesce(col("cnt"), lit(0L)).as("cnt")))
          }
        val merged = (Seq(formula) ++ recomputed.toSeq)
          .reduce(_.unionByName(_))
        DataSkipping.mergeUpsert(spark, viewTable, merged, Seq(groupCol),
          txn = Some(appId -> batchId))
      }
    } finally delta.unpersist()
  }

  /** Fold one feed micro-batch (possibly spanning several versions —
    * signed deltas are additive, so composition is free) into the
    * view as ONE idempotent MERGE. `private[streaming]` so the crash
    * window (merge committed, offset lost → replay with the same
    * batchId) is directly testable.
    */
  private[streaming] def foldBatch(spark: SparkSession, viewTable: String,
      groupCol: String, valueCol: String, batch: DataFrame,
      batchId: Long, checkpoint: String): Unit = {
    val appId = viewAppId(viewTable, checkpoint)
    // replayed batch (merge committed, offset commit lost): skip the
    // whole fold up front — mergeUpsert would detect it too, but
    // there's no reason to recompute the delta first
    if (DataSkipping.txnVersion(spark, viewTable, appId).exists(_ >= batchId))
      return
    val debit = col(DataSkipping.ChangeTypeCol)
      .isin("delete", "update_preimage")
    val signedVal = when(debit, -col(valueCol).cast(CastType))
      .otherwise(col(valueCol).cast(CastType))
    val delta = batch.groupBy(col(groupCol)).agg(
      sum(signedVal).cast(SumType).as("__d_sum"),
      sum(when(debit, -1L).otherwise(1L)).as("__d_cnt"),
      count(when(col(groupCol).isNull, lit(1))).as("__nulls"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE action computes emptiness AND the envelope (a separate
      // isEmpty would pay a full plan+schedule round for a question
      // the envelope row already answers — guide §1.2: fewer actions)
      val env = delta.agg(min(col(groupCol)), max(col(groupCol)),
        sum(col("__nulls")), count(lit(1))).head()
      if (env.getLong(3) != 0L) {
        // group-key envelope of the delta: three scalars to the
        // driver — the min/max prune the view read to the affected
        // key range via file stats, and the null count REJECTS null
        // group keys loudly (every equality join downstream —
        // the semi-join here, mergeUpsert's key join — is SQL
        // null-unsafe, so a null group would silently duplicate
        // instead of accumulating; same contract as Delta MERGE keys)
        require(env.isNullAt(2) || env.getLong(2) == 0L,
          s"change batch carries ${env.getLong(2)} NULL $groupCol row(s) — " +
            "null group keys cannot be incrementally maintained (merge " +
            "keys are SQL-equality joined); filter them from the base " +
            "table or aggregate them under an explicit sentinel value")
        val inRange =
          col(groupCol).between(lit(env.get(0)), lit(env.get(1)))
        // ... then exact affected-group selection by BROADCAST
        // semi-join against the (batch-bounded) delta keys — never a
        // collected key list, never an IN literal
        val current = DataSkipping.readSkipping(spark, viewTable, inRange)
          .join(broadcast(delta.select(col(groupCol))), Seq(groupCol),
            "left_semi")
        // new value = one hash re-aggregation of (current ∪ delta):
        // existing groups contribute their current row, new groups
        // only their delta, emptied groups fold to a (0, 0) tombstone
        val merged = current
          .select(col(groupCol), col("sum_value").as("__d_sum"),
            col("cnt").as("__d_cnt"))
          .unionByName(delta.drop("__nulls"))
          .groupBy(col(groupCol)).agg(
            sum(col("__d_sum")).cast(SumType).as("sum_value"),
            sum(col("__d_cnt")).as("cnt"))
        DataSkipping.mergeUpsert(spark, viewTable, merged, Seq(groupCol),
          txn = Some(appId -> batchId))
      }
    } finally delta.unpersist()
  }
}
