package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Streaming CDC upsert — the `apply_changes` analog.
  *
  * Re-expresses the reference's silver CDC flow
  * (pos-dlt `03_Bronze-to-Silver ETL.py:375-384`: `apply_changes`
  * keeping the latest row per (store_id, item_id) sequenced by
  * date_time) as `foreachBatch` + [[graft.operators.Cdc.upsert]]
  * over a versioned parquet state store (the plain-Spark stand-in
  * for a Delta MERGE target).
  *
  * Scale: each micro-batch does ONE shuffle — `Cdc.upsert` is a
  * partial-aggregated `max_by(struct)` over state ∪ batch, so state
  * size is bounded by key cardinality (stores x items), never by
  * stream length.
  *
  * CONCURRENCY — single writer, many readers. The reference targets
  * a Delta table (`03:375-384`), where a second concurrent writer is
  * handled by optimistic concurrency; the minimum parity here is
  * DETECTING and REJECTING one: each `upsertBatch` holds an
  * exclusive `_LOCK` file (atomic create-new) for the duration of
  * its read-merge-swap, so two stores writing the same path fail
  * loudly with [[ConcurrentWriterException]] instead of silently
  * overwriting each other's version dir. The lock is released after
  * every batch, so sequential writers (stream restarts) need no
  * handover. A writer that CRASHES mid-batch leaves the lock behind
  * — recover with [[ParquetStateStore.forceReleaseLock]] after
  * confirming the old writer is dead.
  *
  * TIME TRAVEL — versions within `retainVersions` stay on disk and
  * are readable via [[readVersion]] / [[versions]].
  */
final class ParquetStateStore(
    spark: SparkSession,
    path: String,
    keys: Seq[String],
    seqCols: Seq[String],
    payload: Seq[String],
    retainVersions: Int = 2,
    deleteWhen: Option[org.apache.spark.sql.Column] = None) {

  require(retainVersions >= 1, "must retain at least the latest version")

  private val latestPtr = Paths.get(path, "LATEST")

  private val payloadColumns: Seq[String] = keys ++ seqCols ++ payload

  private def versionDir(v: Long) = s"$path/v$v"

  private def latestVersion: Option[Long] =
    if (Files.exists(latestPtr))
      Some(new String(Files.readAllBytes(latestPtr), StandardCharsets.UTF_8).trim.toLong)
    else None

  /** Raw persisted state, INCLUDING delete tombstones when
    * `deleteWhen` is configured (they must survive merges so a late
    * out-of-order update cannot resurrect a deleted key).
    */
  private def rawState: Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(versionDir(v)))

  /** Current materialized state (None before the first batch);
    * tombstoned keys are excluded.
    */
  def current: Option[DataFrame] = rawState.map(dropTombstones)

  private def dropTombstones(df: DataFrame): DataFrame =
    if (df.columns.contains(Cdc.DeletedCol))
      df.filter(!org.apache.spark.sql.functions.col(Cdc.DeletedCol))
        .drop(Cdc.DeletedCol)
    else df

  /** Version numbers currently on disk (ascending) — the time-travel
    * read surface. Bounded by `retainVersions` (+1 transiently
    * mid-GC).
    */
  def versions: Seq[Long] =
    VersionedDir.list(Paths.get(path), "^v(\\d+)$".r).map(_._1)

  /** Historical read of a retained version, tombstones excluded —
    * `readVersion(latest)` == `current`. Versions beyond the
    * retention window are gone from disk; asking for one fails with
    * the retained range in the message.
    */
  def readVersion(v: Long): DataFrame = {
    val have = versions
    require(have.contains(v),
      s"version $v is not retained (have ${have.mkString("[", ",", "]")}; " +
        s"retainVersions=$retainVersions) — raise retainVersions to time-travel further back")
    dropTombstones(spark.read.parquet(versionDir(v)))
  }

  /** Merge a batch of updates: state ∪ batch -> latest row per key
    * (honoring `deleteWhen` markers — `APPLY AS DELETE WHEN` — if
    * configured), written as a new immutable version, then the
    * LATEST pointer is swapped (write-temp + atomic move).
    */
  def upsertBatch(batch: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.functions.lit
    acquireLock()
    var primary: Throwable = null
    try {
      val state = rawState.getOrElse(
        batch.select(payloadColumns.map(org.apache.spark.sql.functions.col): _*)
          .filter(lit(false)))
      val merged = deleteWhen match {
        case Some(cond) => Cdc.applyChanges(state, batch, keys, seqCols, payload, cond,
          retainTombstones = true)
        case None => Cdc.upsert(state, batch, keys, seqCols, payload)
      }
      val next = latestVersion.getOrElse(-1L) + 1
      merged.write.mode("overwrite").parquet(versionDir(next))
      val tmp = Paths.get(path, s".LATEST.tmp$next")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, latestPtr, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      gcOldVersions(next)
    } catch { case t: Throwable => primary = t; throw t }
    finally {
      // a failed self-release must SURFACE (store permanently locked)
      // but never REPLACE an in-flight merge failure — the merge
      // exception is the root cause, the lock error rides suppressed
      try releaseLock()
      catch {
        case scala.util.control.NonFatal(t) =>
          if (primary != null) primary.addSuppressed(t) else throw t
      }
    }
  }

  /** Identifies this store instance in lock files / conflict
    * messages.
    */
  private val writerId: String =
    java.util.UUID.randomUUID().toString

  private def lockFile = Paths.get(path, ParquetStateStore.LockName)

  /** Exclusive writer lock for one read-merge-swap: atomic
    * create-new of `_LOCK`. The whole merge must run under it —
    * serializing only the pointer swap would let two writers read
    * the same base version and silently drop one batch's rows.
    */
  private def acquireLock(): Unit = {
    Files.createDirectories(Paths.get(path))
    try Files.write(lockFile, writerId.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    catch {
      case _: FileAlreadyExistsException =>
        val holder =
          try new String(Files.readAllBytes(lockFile), StandardCharsets.UTF_8)
          catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
        throw new ConcurrentWriterException(
          s"state store at $path is being written by another writer " +
            s"(lock held by $holder, this writer is $writerId). If that " +
            "writer crashed, recover with ParquetStateStore.forceReleaseLock(path).")
    }
  }

  /** Delete the lock only if THIS writer still owns it. After a
    * mistaken `forceReleaseLock` (old writer presumed dead but
    * actually slow) and a re-acquire by a new writer, the slow
    * original's finally-block must not delete the NEW holder's lock
    * — that would reopen the lost-update window for a third writer.
    *
    * The check-then-delete is NOT atomic (a plain filesystem has no
    * compare-and-delete), so a forceRelease+re-acquire landing in
    * the window between the read and the delete can still lose the
    * new lock — the ownership check shrinks the hazard from "every
    * release" to "a release racing a misused forceRelease", it
    * cannot close it. Treat forceReleaseLock as an offline recovery
    * tool, not an online operation.
    *
    * A failed delete of our OWN lock propagates (the store would be
    * permanently locked — surface it; recovery is forceReleaseLock);
    * an unreadable/missing lock file just means we no longer own it.
    */
  private def releaseLock(): Unit = {
    val mine =
      try Files.exists(lockFile) &&
        new String(Files.readAllBytes(lockFile), StandardCharsets.UTF_8) == writerId
      catch { case scala.util.control.NonFatal(_) => false }
    if (mine) Files.deleteIfExists(lockFile)
  }

  /** Retention: after the pointer swap, delete version dirs older
    * than the last `retainVersions` — without this a continuous
    * stream (one full state copy per micro-batch) leaks storage
    * without bound. Runs AFTER the swap so a crash mid-GC never
    * touches the referenced version; keeping >= 2 versions also
    * shields a concurrent reader that resolved the previous pointer
    * just before the swap.
    */
  private def gcOldVersions(latest: Long): Unit = {
    val cutoff = latest - retainVersions + 1
    if (cutoff > 0) {
      VersionedDir.list(Paths.get(path), "^v(\\d+)$".r)
        .collect { case (v, p) if v < cutoff =>
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().forEachRemaining(Files.deleteIfExists(_))
          finally walk.close() // Files.walk/list leak an fd per call unless closed
        }
    }
  }
}

/** A second writer attempted to merge into a [[ParquetStateStore]]
  * while another held the lock.
  */
final class ConcurrentWriterException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

object ParquetStateStore {
  private[streaming] val LockName = "_LOCK"

  /** Remove a stale writer lock left by a crashed writer. Only call
    * after confirming the previous writer is dead — releasing the
    * lock under a LIVE writer reintroduces the lost-update race the
    * lock exists to prevent.
    */
  def forceReleaseLock(path: String): Boolean =
    Files.deleteIfExists(Paths.get(path, LockName))
}

object CdcStream {

  /** Start the streaming upsert: every micro-batch of `updates` is
    * merged into `store` (latest row per key wins, ordered by
    * `seqCols`).
    */
  def run(
      updates: DataFrame,
      store: ParquetStateStore,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsertBatch(batch)
      }
      .start()
}
