package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.{Files, Paths, StandardCopyOption}
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
  def current: Option[DataFrame] = rawState.map { df =>
    if (df.columns.contains(Cdc.DeletedCol))
      df.filter(!org.apache.spark.sql.functions.col(Cdc.DeletedCol))
        .drop(Cdc.DeletedCol)
    else df
  }

  /** Merge a batch of updates: state ∪ batch -> latest row per key
    * (honoring `deleteWhen` markers — `APPLY AS DELETE WHEN` — if
    * configured), written as a new immutable version, then the
    * LATEST pointer is swapped (write-temp + atomic move).
    */
  def upsertBatch(batch: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.functions.lit
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
    Files.createDirectories(Paths.get(path))
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestPtr, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    gcOldVersions(next)
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
    val dir = Paths.get(path)
    if (cutoff > 0 && Files.isDirectory(dir)) {
      val versioned = "^v(\\d+)$".r
      val listing = Files.list(dir)
      try {
        listing.iterator().forEachRemaining { p =>
          p.getFileName.toString match {
            case versioned(v) if v.toLong < cutoff =>
              val walk = Files.walk(p)
              try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .iterator().forEachRemaining(Files.deleteIfExists(_))
              finally walk.close() // Files.walk/list leak an fd per call unless closed
            case _ => ()
          }
        }
      } finally listing.close()
    }
  }
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
