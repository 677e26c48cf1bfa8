package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.{Files, Paths}

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
  * CONCURRENCY — optimistic, Delta-style (the reference's target
  * table `03:375-384` is Delta, where two concurrent pipelines
  * sharing a target both commit via optimistic retry). Each
  * `upsertBatch` (1) resolves the latest committed version B,
  * (2) merges state(vB) ∪ batch into a private `.staged-*` dir,
  * (3) COMMITS by atomically renaming the staged dir to `v{B+1}`.
  * The rename is the whole commit: a version dir either exists
  * complete or not at all, and renaming onto an existing (non-empty)
  * dir fails — which is exactly how a lost race is detected. The
  * loser deletes its staging, re-reads the NEW base (including the
  * winner's rows), re-merges and retries at `v{B+2}` — no update is
  * ever lost, and concurrent writers serialize into a linear version
  * history. `maxCommitRetries` consecutive lost races fail loudly
  * with [[ConcurrentWriterException]].
  *
  * The commit primitive is PLUGGABLE ([[CommitCoordinator]]): the
  * default [[RenameCoordinator]] assumes atomic rename-if-absent
  * (true on POSIX filesystems and HDFS); object stores without
  * atomic rename use [[LockFileCoordinator]], which rebuilds the
  * same either-fully-committed-or-invisible guarantee from the
  * conditional-put primitive they DO have (lock object + per-file
  * copy + marker-object commit point — closing the caveat Delta's
  * log protocol documents). A writer that crashes mid-merge leaves
  * only an inert `.staged-*` dir (never a partial version):
  * other writers are unaffected, and [[ParquetStateStore.vacuumStaging]]
  * clears the leftovers; a lock-coordinator writer crashing
  * mid-PUBLISH leaves a marker-less partial version dir that stays
  * invisible to readers and is repaired by the next publisher.
  *
  * TIME TRAVEL — versions within `retainVersions` stay on disk and
  * are readable via [[readVersion]] / [[versions]]. `retainVersions`
  * >= 2 (the default) also shields a concurrent writer's in-flight
  * merge from GC: its base version survives until the NEXT commit
  * after the one that beat it.
  */
final class ParquetStateStore(
    spark: SparkSession,
    path: String,
    keys: Seq[String],
    seqCols: Seq[String],
    payload: Seq[String],
    retainVersions: Int = 2,
    deleteWhen: Option[org.apache.spark.sql.Column] = None,
    maxCommitRetries: Int = 10,
    coordinator: CommitCoordinator = RenameCoordinator) {

  require(retainVersions >= 1, "must retain at least the latest version")

  private val payloadColumns: Seq[String] = keys ++ seqCols ++ payload

  private def versionDir(v: Long) = s"$path/v$v"

  /** Latest committed version = max `v<N>` dir the coordinator
    * confirms committed. Under rename-commit a listed dir is always
    * complete (the rename IS the commit); under marker-commit a
    * partially-published dir without its marker is filtered here —
    * the read-side half of the commit protocol.
    */
  private def latestVersion: Option[Long] =
    committedVersions.lastOption.map(_._1)

  private def committedVersions: Seq[(Long, java.nio.file.Path)] = {
    readProtocolChecked
    VersionedDir.list(Paths.get(path), "^v(\\d+)$".r)
      .filter { case (_, p) => coordinator.isCommitted(p) }
  }

  /** The commit protocol is part of the STORE, not the writer: a
    * LockFileCoordinator-written store opened with the default
    * rename coordinator would treat marker-less partial version dirs
    * as committed — exactly the partial visibility the marker
    * protocol prevents. The first commit stamps the store root with
    * the coordinator class (`_graft_commit_protocol`); every later
    * writer AND reader instance verifies it matches and fails
    * loudly on a mismatch instead of misreading.
    */
  private def verifyProtocol(create: Boolean): Unit = {
    val tag = Paths.get(path, "_graft_commit_protocol")
    val name = coordinator.getClass.getName
    if (create && !Files.exists(tag)) {
      // PRE-PROTOCOL stores (version dirs, no tag — written before
      // the stamp existed, under rename-commit): stamping them with a
      // coordinator whose isCommitted rejects every existing version
      // would make latestVersion None, and the first publish would
      // delete the real committed v0 as a "crashed rival's partial
      // copy" — silent data loss. Refuse unless the configured
      // coordinator recognizes at least one existing version as
      // committed (trivially true for RenameCoordinator, the protocol
      // such stores were written under).
      val existing = VersionedDir.list(Paths.get(path), "^v(\\d+)$".r)
      if (existing.nonEmpty && !existing.exists { case (_, p) => coordinator.isCommitted(p) })
        throw new IllegalStateException(
          s"state store at $path has ${existing.size} version dir(s) but no " +
            s"commit-protocol tag, and $name recognizes none of them as " +
            "committed — publishing would delete real committed versions as " +
            "crashed partial copies. Open the store with the coordinator it " +
            "was written under (pre-tag stores used RenameCoordinator), or " +
            "migrate it explicitly by rewriting its state through the new " +
            "coordinator into a fresh store path")
      // stamp via temp + atomic move: a CREATE_NEW + write pair lets
      // a concurrent reader observe the tag created but EMPTY (seen
      // as a protocol mismatch); the move publishes complete bytes
      // or nothing — the local analog of an object store's atomic PUT
      val tmp = Files.createTempFile(Paths.get(path), ".protocol-", ".tmp")
      try {
        Files.write(tmp, name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try Files.move(tmp, tag, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException => () } // rival stamped it
      } finally Files.deleteIfExists(tmp)
    }
    if (Files.exists(tag)) {
      val existing = new String(Files.readAllBytes(tag),
        java.nio.charset.StandardCharsets.UTF_8)
      if (existing != name)
        throw new IllegalStateException(
          s"state store at $path was written under commit protocol $existing " +
            s"but this instance is configured with $name — mixing protocols makes " +
            "partial versions visible; open the store with the original coordinator")
    }
  }

  // validate-only on the read path (reading must not mutate the store)
  private lazy val readProtocolChecked: Unit = verifyProtocol(create = false)

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
  def versions: Seq[Long] = committedVersions.map(_._1)

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

  /** Change data feed between two retained versions — the Delta CDF
    * analog a downstream incremental consumer reads instead of
    * re-scanning the full state: one row per key whose VISIBLE state
    * changed from `fromV` to `toV`, tagged `insert` / `update` /
    * `delete` (tombstone transitions count: a key deleted-then-
    * reinserted between the two versions is an update of the visible
    * row). Inserts and updates carry the post-image, deletes the
    * pre-image.
    *
    * Scale: ONE full-outer equi join between two state versions,
    * keyed on the store keys — state-sized, not history-sized, and
    * only changed rows survive the filter.
    */
  def changes(fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val have = versions
    require(have.contains(fromV) && have.contains(toV),
      s"versions [$fromV,$toV] not retained (have ${have.mkString("[", ",", "]")})")
    val nonKey = (seqCols ++ payload).toSeq
    def side(v: Long, p: String): DataFrame = {
      val raw = spark.read.parquet(versionDir(v))
      val visible =
        if (raw.columns.contains(Cdc.DeletedCol)) raw.filter(!col(Cdc.DeletedCol))
        else raw
      visible.select(keys.map(col) ++
        nonKey.map(c => col(c).as(s"${p}_$c")) :+
        lit(true).as(s"${p}_present"): _*)
    }
    val a = side(fromV, "a")
    val b = side(toV, "b")
    val joined = a.join(b, keys.toSeq, "full_outer")
    val aP = col("a_present").isNotNull
    val bP = col("b_present").isNotNull
    val differs = nonKey
      .map(c => struct(col(s"a_$c")) =!= struct(col(s"b_$c"))) // null-safe via struct
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(!aP && bP, lit("insert"))
          .when(aP && !bP, lit("delete"))
          .when(aP && bP && differs, lit("update")))
      .filter(col("change_type").isNotNull)
      .select((col("change_type") +: keys.map(col)) ++
        // post-image for insert/update, pre-image for delete
        nonKey.map(c =>
          when(bP, col(s"b_$c")).otherwise(col(s"a_$c")).as(c)): _*)
  }

  /** Merge a batch of updates: state ∪ batch -> latest row per key
    * (honoring `deleteWhen` markers — `APPLY AS DELETE WHEN` — if
    * configured), committed optimistically (see class doc): merge
    * against the latest version into a staged dir, atomically rename
    * into the version history, and on a lost race re-merge against
    * the winner's version and retry.
    *
    * Replay-safe: re-applying the same batch (foreachBatch delivers
    * at-least-once across restarts) re-merges rows that are already
    * the latest per key — a new version with identical content.
    */
  def upsertBatch(batch: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.functions.lit
    commitOptimistically { base =>
      val state = base.map(v => spark.read.parquet(versionDir(v))).getOrElse(
        batch.select(payloadColumns.map(org.apache.spark.sql.functions.col): _*)
          .filter(lit(false)))
      deleteWhen match {
        case Some(cond) => Cdc.applyChanges(state, batch, keys, seqCols, payload, cond,
          retainTombstones = true)
        case None => Cdc.upsert(state, batch, keys, seqCols, payload)
      }
    }
  }

  /** OPTIMIZE-style compaction: rewrite the latest version's many
    * small files (each micro-batch commit inherits the merge's
    * shuffle-partition count) into ceil(bytes/targetFileBytes)
    * files, committed as a NEW version through the SAME optimistic
    * path as a data commit — so compaction never blocks or corrupts
    * concurrent writers: if an upsert wins the version slot first,
    * the compactor simply re-reads the winner's state and retries,
    * and vice versa. Content (including tombstones) is byte-for-byte
    * the same rows; only the file layout changes. No-op (None)
    * before the first commit.
    *
    * Returns the committed version. At 100 TB this is what keeps a
    * long-running CDC target scannable: thousands of 100-row files
    * from frequent triggers become a handful of target-sized files,
    * without stopping the stream.
    */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024): Option[Long] = synchronized {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    latestVersion.map { _ =>
      commitOptimistically { base =>
        val dir = versionDir(base.getOrElse(
          sys.error("state store emptied mid-compaction")))
        val bytes = ParquetStateStore.dirBytes(Paths.get(dir))
        val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        spark.read.parquet(dir).coalesce(nFiles)
      }
    }
  }

  /** The shared Delta-style commit loop (see class doc): resolve the
    * latest version, build the new full state from it, stage, rename
    * to commit, re-merge and retry on a lost race. Returns the
    * committed version.
    */
  private def commitOptimistically(makeMerged: Option[Long] => DataFrame): Long = {
    Files.createDirectories(Paths.get(path))
    verifyProtocol(create = true)
    var attempt = 0
    // contention WITHOUT a committed rival (a lock held by a live
    // publisher) is not a lost race: the rival will either commit
    // (then we count a real loss) or die and be lease-stolen, so
    // these polls get their own, much larger bound instead of
    // burning maxCommitRetries while making no progress
    var stalls = 0
    val maxStalls = maxCommitRetries * 20
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion
      val merged = makeMerged(base)
      val next = base.getOrElse(-1L) + 1
      stagedSeq += 1
      val staged = Paths.get(path, s".staged-$writerId-$stagedSeq")
      def lostRace(cause: Throwable): Unit = {
        attempt += 1
        if (attempt > maxCommitRetries)
          throw new ConcurrentWriterException(
            s"state store at $path: lost $attempt consecutive commit races " +
              s"(writer $writerId, contended version v$next) — too many " +
              "concurrent writers for maxCommitRetries=" + maxCommitRetries, cause)
      }
      try {
        merged.write.mode("overwrite").parquet(staged.toString)
        beforeCommit() // test seam: deterministic interleaving
        // THE commit: the coordinator publishes the staged dir onto
        // the next version slot — atomic rename on POSIX/HDFS, the
        // lock+marker protocol on object stores. false = a rival won
        // (or holds the commit lock): re-merge against the new
        // latest and retry.
        if (coordinator.publish(staged, Paths.get(versionDir(next)))) committed = next
        else if (coordinator.isCommitted(Paths.get(versionDir(next)))) lostRace(null)
        else {
          stalls += 1
          if (stalls > maxStalls)
            throw new ConcurrentWriterException(
              s"state store at $path: commit slot v$next contended $stalls times " +
                s"with no rival commit (writer $writerId) — a publisher is stuck " +
                "holding the commit lock past its lease")
        }
      } catch {
        // CONFLICT = any failure while a COMMITTED v{next} exists — a
        // rival published it, so re-merge against the winner and
        // retry. The predicate is committed-rival state, not
        // exception type (see RenameCoordinator's doc for why type
        // matching misses real races). It also absorbs a base version
        // GC'd by rivals mid-merge: the staged write's lazy read of
        // v{base} then fails, but rivals having committed >= 2
        // versions implies a committed v{next}, and the correct
        // response is exactly this re-merge-and-retry. A failure with
        // NO committed v{next} (disk full, corrupt batch...) is not a
        // race and propagates.
        case e: Exception
            if Files.isDirectory(Paths.get(versionDir(next))) &&
              coordinator.isCommitted(Paths.get(versionDir(next))) =>
          lostRace(e)
      } finally {
        if (committed < 0) ParquetStateStore.deleteRecursively(staged)
      }
    }
    gcOldVersions(latestVersion.getOrElse(0L))
    committed
  }

  /** Identifies this store instance in staging dirs / conflict
    * messages.
    */
  private val writerId: String =
    java.util.UUID.randomUUID().toString

  /** Distinguishes staging dirs across retries within this writer. */
  private var stagedSeq: Long = 0L

  /** Test seam: runs between staging and the commit rename, so specs
    * can force a rival's commit to land first and exercise the
    * conflict-retry path deterministically.
    */
  @volatile private[streaming] var beforeCommit: () => Unit = () => ()

  /** Retention: after a successful commit, delete version dirs older
    * than the last `retainVersions` — without this a continuous
    * stream (one full state copy per micro-batch) leaks storage
    * without bound. Runs AFTER the commit rename so a crash mid-GC
    * never touches the committed version; keeping >= 2 versions also
    * shields a concurrent reader (or a rival writer's in-flight
    * merge) that resolved the previous latest just before this
    * commit.
    */
  private def gcOldVersions(latest: Long): Unit = {
    val cutoff = latest - retainVersions + 1
    if (cutoff > 0) {
      VersionedDir.list(Paths.get(path), "^v(\\d+)$".r)
        .collect { case (v, p) if v < cutoff => ParquetStateStore.deleteRecursively(p) }
    }
  }
}

/** A [[ParquetStateStore]] writer exhausted its optimistic-commit
  * retries — more concurrent writers than `maxCommitRetries` can
  * absorb.
  */
final class ConcurrentWriterException(msg: String, cause: Throwable = null)
    extends java.util.ConcurrentModificationException(msg) {
  initCause(cause)
}

object ParquetStateStore {

  /** Delete leftover `.staged-*` dirs (crashed or race-losing
    * writers' private staging — never part of the committed
    * history). Safe only when no writer is MID-MERGE on this store:
    * a live writer's staging dir looks identical to a dead one's.
    * Returns the number of dirs removed.
    */
  def vacuumStaging(path: String): Int = {
    val listing =
      if (!Files.isDirectory(Paths.get(path))) java.util.stream.Stream.empty[java.nio.file.Path]()
      else Files.list(Paths.get(path))
    try {
      var n = 0
      listing.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.startsWith(".staged-")) { deleteRecursively(p); n += 1 }
      }
      n
    } finally listing.close()
  }

  /** Total bytes of regular files under a dir (compaction sizing). */
  private[streaming] def dirBytes(p: java.nio.file.Path): Long = {
    val walk = Files.walk(p)
    try {
      var n = 0L
      walk.iterator().forEachRemaining(f =>
        if (Files.isRegularFile(f)) n += Files.size(f))
      n
    } finally walk.close()
  }

  private[streaming] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().forEachRemaining(Files.deleteIfExists(_))
      finally walk.close() // Files.walk/list leak an fd per call unless closed
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
