package graft.streaming

import java.nio.file.{FileAlreadyExistsException, Files, Path}

/** The commit primitive a [[ParquetStateStore]] uses to publish a
  * staged version dir as `v{next}` — pluggable because the ONLY
  * filesystem property the optimistic protocol needs ("a version is
  * either completely committed or not visible, and two writers
  * cannot both commit the same version") is provided by different
  * primitives on different storage:
  *
  *  - POSIX / HDFS: rename-if-absent is atomic — the rename IS the
  *    commit ([[RenameCoordinator]], the default; identical behavior
  *    to the pre-r7 hardcoded path).
  *  - S3 / GCS-class object stores: no atomic directory rename (a
  *    "rename" is a per-object copy loop with partial visibility),
  *    but they DO have a conditional single-object put (S3
  *    `If-None-Match`, GCS `x-goog-if-generation-match: 0`) —
  *    [[LockFileCoordinator]] builds the commit from exactly that
  *    primitive: an exclusive lock object serializes publishers, the
  *    (non-atomic) copy runs under the lock, and a marker object
  *    written LAST is the commit point readers trust. Modeled here
  *    on `Files.createFile` (atomic CREATE_NEW — the local-FS
  *    equivalent of the conditional put); a real S3 binding swaps
  *    the create/exists/delete calls for object-store requests, the
  *    protocol is unchanged.
  *
  * Contract:
  *  - [[publish]] returns true iff this writer committed `target`;
  *    false signals a lost race / live contention (the store
  *    re-merges against the new latest and retries). Non-contention
  *    failures (disk full, corrupt batch) must propagate as
  *    exceptions.
  *  - [[isCommitted]] decides whether a LISTED version dir is a
  *    completed commit — the read-side half of the protocol (under
  *    rename-commit, existence == committed; under marker-commit, a
  *    partially-copied dir without its marker is invisible).
  */
trait CommitCoordinator extends Serializable {

  /** Publish `staged` as `target` iff `target` is not already
    * committed. True = committed by this call; false = lost
    * race/contention, caller should re-merge and retry.
    */
  def publish(staged: Path, target: Path): Boolean

  /** Whether a listed version dir is a completed commit. */
  def isCommitted(target: Path): Boolean = true
}

/** Rename-as-commit for filesystems with atomic rename-if-absent
  * (POSIX, HDFS). A version dir either exists complete or not at
  * all; renaming onto an existing (non-empty) dir fails — that
  * failure is the lost-race signal. Matching on "target exists"
  * instead of exception TYPE is load-bearing: `Files.move`'s
  * no-REPLACE path is stat-then-rename(2), and when both writers
  * pass the stat the loser's rename fails with ENOTEMPTY, which
  * Linux surfaces as a GENERIC FileSystemException
  * (DirectoryNotEmptyException only comes from the REPLACE_EXISTING
  * delete path).
  */
object RenameCoordinator extends CommitCoordinator {
  override def publish(staged: Path, target: Path): Boolean =
    try { Files.move(staged, target); true }
    catch { case _: Exception if Files.isDirectory(target) => false }
}

/** Marker-file commit under an exclusive lock, built ONLY from
  * primitives object stores provide (conditional put = atomic
  * exclusive file create, list, delete):
  *
  *  1. acquire `.{target}.lock` via exclusive create — the
  *     conditional put. A fresh rival lock → brief poll, then report
  *     contention (false) so the store's bounded retry loop owns the
  *     policy. A lock older than `lockTimeoutMs` is STALE (its
  *     holder crashed mid-publish — the copy loop leaves no
  *     heartbeat) and is stolen; the steal itself re-races through
  *     exclusive create, so two stealers cannot both win.
  *  2. under the lock: if `target` carries the commit marker, a
  *     rival won — release and report false. If `target` exists
  *     WITHOUT the marker, it is a crashed rival's partial copy —
  *     delete it (it was never visible to readers: [[isCommitted]]
  *     gates on the marker).
  *  3. copy the staged dir file-by-file — deliberately NON-atomic,
  *     exactly like an object-store "rename".
  *  4. write the `_graft_commit` marker LAST: the single-object
  *     commit point. Readers (and rival writers) treat the version
  *     as existing only once the marker does.
  *
  * Crash analysis: dying before (4) leaves a partial dir + a lock
  * that goes stale — invisible to readers, repaired by the next
  * publisher via (2). Dying after (4) but before the lock release
  * leaves a committed version + a stale lock — the next publisher
  * steals the lock and sees the marker (false: lost race).
  *
  * Steal safety is LEASE-based, the standard non-fencing caveat: a
  * lock is only stolen `lockTimeoutMs` after its last write, so
  * liveness assumes a publisher either finishes or is dead within
  * the lease (Delta on pre-conditional-put S3 ran a DynamoDB
  * coordination table for exactly this reason). Two independent
  * fences keep even a broken lease from committing garbage:
  *
  *  - each lock carries its owner's token, the steal DELETE is
  *    conditioned on the stale token it observed (the local
  *    verify-then-delete stand-in for an object store's
  *    generation-conditioned delete — so a stealer cannot remove a
  *    lock it did not judge stale), and the owner re-checks the
  *    token before the marker write: a stolen lease aborts the
  *    original owner unmarked;
  *  - the marker is written only after re-listing `target` and
  *    confirming it contains EXACTLY the files this writer copied
  *    (relative path + size): if two writers ever interleave copies
  *    into the slot (a double-expired lease plus a lost steal
  *    race), the listing mismatches for at least the writer who
  *    commits last, so a MIXED directory can never become a
  *    committed version — worst case both abort, re-merge, retry.
  */
class LockFileCoordinator(
    lockTimeoutMs: Long = 60000L,
    lockPollMs: Long = 25L) extends CommitCoordinator {

  val MarkerFile = "_graft_commit"

  override def isCommitted(target: Path): Boolean =
    Files.exists(target.resolve(MarkerFile))

  override def publish(staged: Path, target: Path): Boolean = {
    val lock = target.resolveSibling("." + target.getFileName.toString + ".lock")
    val token = java.util.UUID.randomUUID().toString
    if (!acquire(lock, token)) return false
    try {
      if (isCommitted(target)) return false
      if (Files.exists(target)) ParquetStateStore.deleteRecursively(target)
      val copied = copyTree(staged, target)
      beforeMarker() // test seam: crash/interleave injection mid-publish
      // fence 1: if our lease was stolen mid-copy, the thief owns
      // the slot now — abort WITHOUT the marker (our partial copy
      // stays invisible and the thief's clear step removes it)
      if (!holds(lock, token)) return false
      // fence 2: the slot must hold exactly what we copied — a
      // rival's interleaved files (double-expired lease) or a
      // concurrent mutation means this dir must never be marked
      if (listTree(target) != copied) return false
      Files.createFile(target.resolve(MarkerFile))
      ParquetStateStore.deleteRecursively(staged)
      true
    } finally {
      if (holds(lock, token)) Files.deleteIfExists(lock)
    }
  }

  private def holds(lock: Path, token: String): Boolean =
    try new String(Files.readAllBytes(lock),
      java.nio.charset.StandardCharsets.UTF_8) == token
    catch { case _: java.io.IOException => false }

  private def acquire(lock: Path, token: String): Boolean = {
    def create(): Boolean =
      try {
        Files.write(lock, token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch { case _: FileAlreadyExistsException => false }
    if (create()) true
    else {
      // read the holder's token FIRST: the steal delete below is
      // conditioned on it, so we can never delete a lock that was
      // replaced after we judged it stale
      val observed =
        try Some(new String(Files.readAllBytes(lock),
          java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: java.io.IOException => None } // vanished: holder just released
      val stale = observed.isDefined &&
        (try System.currentTimeMillis() -
          Files.getLastModifiedTime(lock).toMillis > lockTimeoutMs
        catch { case _: java.io.IOException => false })
      if (stale) {
        // conditional delete (generation-match analog): only the
        // exact stale lock we observed
        if (holds(lock, observed.get)) Files.deleteIfExists(lock)
        create() // lost the steal race unless our create wins
      } else {
        Thread.sleep(lockPollMs) // live rival mid-publish: don't spin the retry loop dry
        false
      }
    }
  }

  /** Per-file copy in listing order — partial visibility on crash is
    * the POINT (it models the object-store copy loop); the marker
    * protocol makes it safe. Returns the (relative path -> size)
    * manifest of everything copied, for the pre-marker fence.
    */
  private def copyTree(from: Path, to: Path): Map[String, Long] = {
    Files.createDirectories(to)
    val out = scala.collection.mutable.Map.empty[String, Long]
    val walk = Files.walk(from)
    try walk.iterator().forEachRemaining { p =>
      val rel = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(rel)
      else {
        Files.copy(p, rel)
        out(from.relativize(p).toString) = Files.size(p)
      }
    } finally walk.close()
    out.toMap
  }

  /** (relative path -> size) of every regular file under `dir`. */
  private def listTree(dir: Path): Map[String, Long] = {
    val out = scala.collection.mutable.Map.empty[String, Long]
    val walk = Files.walk(dir)
    try walk.iterator().forEachRemaining { p =>
      if (Files.isRegularFile(p)) out(dir.relativize(p).toString) = Files.size(p)
    } finally walk.close()
    out.toMap
  }

  /** Test seam: runs after the copy, before the marker write. */
  protected def beforeMarker(): Unit = ()
}
