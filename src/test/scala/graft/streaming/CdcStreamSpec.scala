package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class CdcStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch upsert keeps the latest row per key across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val stateDir = tmpDir("cdc_state")
    val ckpt = tmpDir("cdc_ckpt")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("store_id", "item_id"), seqCols = Seq("date_time"),
      payload = Seq("quantity"))

    val input = MemoryStream[(Int, Int, Timestamp, Int)]
    val updates = input.toDS.toDF("store_id", "item_id", "date_time", "quantity")

    input.addData(
      (1, 100, ts("2024-01-01 08:00:00"), 50),
      (1, 100, ts("2024-01-01 09:00:00"), 40), // newer wins
      (2, 200, ts("2024-01-01 08:30:00"), 10))
    val q1 = CdcStream.run(updates, store, ckpt)
    q1.awaitTermination()

    val v1 = store.current.get.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(3)).toMap
    assert(v1 === Map((1, 100) -> 40, (2, 200) -> 10))

    // second round: an older row must NOT overwrite, a newer one must
    input.addData(
      (1, 100, ts("2024-01-01 07:00:00"), 99), // stale
      (2, 200, ts("2024-01-01 10:00:00"), 5)) // newer
    val q2 = CdcStream.run(updates, store, ckpt)
    q2.awaitTermination()

    val v2 = store.current.get.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(3)).toMap
    assert(v2 === Map((1, 100) -> 40, (2, 200) -> 5))
  }

  test("delete markers (APPLY AS DELETE WHEN) remove keys across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val store = new ParquetStateStore(s, tmpDir("cdc_state_del"),
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      deleteWhen = Some(org.apache.spark.sql.functions.col("op") === "D"))

    val input = MemoryStream[(Int, Int, Int, String)]
    val updates = input.toDS.toDF("k", "seq", "v", "op")
    val ckpt = tmpDir("cdc_ckpt_del")

    input.addData((1, 1, 10, "U"), (2, 1, 20, "U"))
    CdcStream.run(updates, store, ckpt).awaitTermination()
    input.addData((1, 2, 0, "D"), (2, 0, 0, "D"), (3, 1, 30, "U"))
    CdcStream.run(updates, store, ckpt).awaitTermination()

    val state = store.current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    // k=1 deleted (newest op), k=2's stale delete ignored, k=3 inserted
    assert(state === Map(2 -> 20, 3 -> 30))

    // a LATE update older than the delete arrives in a later batch:
    // the retained tombstone must win — no resurrection
    input.addData((1, 1, 99, "U"))
    CdcStream.run(updates, store, ckpt).awaitTermination()
    val state2 = store.current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state2 === Map(2 -> 20, 3 -> 30),
      "late out-of-order update must not resurrect a deleted key")

    // but a genuinely NEWER row re-inserts
    input.addData((1, 3, 11, "U"))
    CdcStream.run(updates, store, ckpt).awaitTermination()
    val state3 = store.current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state3 === Map(1 -> 11, 2 -> 20, 3 -> 30))
  }

  test("a commit race is detected and retried: both writers' rows survive") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_occ")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"), retainVersions = 10)
    val rival = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"), retainVersions = 10)

    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // v0

    // Deterministic lost update: just before `store` renames its
    // staged merge into v1, `rival` commits v1 first. store's rename
    // must fail, and the retry must re-merge against RIVAL'S v1 (not
    // the stale v0 it staged from), landing as v2 with both rows.
    var fired = false
    store.beforeCommit = () => {
      if (!fired) {
        fired = true // rival must commit exactly once, not per retry
        rival.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v")) // wins v1
      }
    }
    store.upsertBatch(Seq((3, 1, 30)).toDF("k", "seq", "v")) // loses v1, retries -> v2
    assert(fired)

    assert(store.versions === Seq(0L, 1L, 2L))
    val state = store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state === Map(1 -> 10, 2 -> 20, 3 -> 30), "no update may be lost to the race")
    // the loser's abandoned staging must not linger
    val staged = new java.io.File(stateDir).listFiles().map(_.getName)
      .filter(_.startsWith(".staged-")).toSeq
    assert(staged.isEmpty, s"leftover staging dirs: $staged")
  }

  test("conflict detection is by committed-rival state, not exception type") {
    // The true rename race on Linux surfaces as a GENERIC
    // FileSystemException (ENOTEMPTY from rename(2) when both
    // writers pass Files.move's stat pre-check), and a base version
    // GC'd by rivals mid-merge surfaces as a Spark read failure —
    // neither is FileAlreadyExistsException. The store must treat
    // ANY failure while a rival's v{next} exists as a lost race and
    // retry; simulate those shapes by throwing a generic IOException
    // from the commit path after the rival committed.
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_generic")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"), retainVersions = 10)
    val rival = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"), retainVersions = 10)
    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // v0

    var fired = false
    store.beforeCommit = () => {
      if (!fired) {
        fired = true
        rival.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v")) // wins v1
        throw new java.io.IOException("simulated ENOTEMPTY-shaped race failure")
      }
    }
    store.upsertBatch(Seq((3, 1, 30)).toDF("k", "seq", "v")) // retries -> v2
    assert(fired)
    assert(store.versions === Seq(0L, 1L, 2L))
    val state = store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state === Map(1 -> 10, 2 -> 20, 3 -> 30))
  }

  test("lock-file coordinator: race detected and retried under the object-store protocol") {
    // the SAME lost-update scenario as the rename-coordinator race
    // test, but through the non-atomic copy + lock + marker protocol
    // — no atomic directory rename anywhere on the commit path
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_lockocc")
    def mk() = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 10, coordinator = new LockFileCoordinator())
    val store = mk()
    val rival = mk()

    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // v0
    var fired = false
    store.beforeCommit = () => {
      if (!fired) {
        fired = true
        rival.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v")) // wins v1
      }
    }
    store.upsertBatch(Seq((3, 1, 30)).toDF("k", "seq", "v")) // loses v1, retries -> v2
    assert(fired)
    assert(store.versions === Seq(0L, 1L, 2L))
    val state = store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state === Map(1 -> 10, 2 -> 20, 3 -> 30), "no update may be lost to the race")
    // no lock files or staging may linger
    val leftovers = new java.io.File(stateDir).listFiles().map(_.getName)
      .filter(n => n.startsWith(".staged-") || n.endsWith(".lock")).toSeq
    assert(leftovers.isEmpty, s"leftover commit artifacts: $leftovers")
  }

  test("lock-file coordinator: a crash mid-publish leaves an invisible partial that the next commit repairs") {
    val s = spark
    import s.implicits._
    import java.nio.file.{Files, Paths}
    val stateDir = tmpDir("cdc_state_lockcrash")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 10, coordinator = new LockFileCoordinator(lockTimeoutMs = 200L))
    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // v0

    // fake the on-disk state of a writer that died between the copy
    // loop and the marker write: a partial v1 (garbage bytes, NO
    // marker) plus its still-held lock
    val partial = Paths.get(stateDir, "v1")
    Files.createDirectories(partial)
    Files.write(partial.resolve("part-00000.parquet"), Array[Byte](9, 9, 9))
    val lock = Paths.get(stateDir, ".v1.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))

    // the partial is INVISIBLE: version surface and reads see only v0
    assert(store.versions === Seq(0L))
    assert(store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
      === Map(1 -> 10))

    // the next committer steals the stale lock, clears the partial,
    // and publishes a REAL v1 merged from v0
    store.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    assert(store.versions === Seq(0L, 1L))
    assert(store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
      === Map(1 -> 10, 2 -> 20))
    assert(!Files.exists(lock), "stolen lock must be released")
    assert(Files.exists(partial.resolve("_graft_commit")), "repaired v1 must carry the marker")
  }

  test("lock-file coordinator: many concurrent writers serialize without atomic rename") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_lockmany")
    val writers = (1 to 4).map { _ =>
      new ParquetStateStore(s, stateDir,
        keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
        retainVersions = 100, maxCommitRetries = 50,
        coordinator = new LockFileCoordinator())
    }
    val threads = writers.zipWithIndex.map { case (w, i) =>
      new Thread(() => w.upsertBatch(Seq((i, 1, i * 10)).toDF("k", "seq", "v")))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val store = writers.head
    assert(store.versions === Seq(0L, 1L, 2L, 3L),
      "4 commits must serialize into 4 consecutive versions")
    val state = store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state === Map(0 -> 0, 1 -> 10, 2 -> 20, 3 -> 30))
  }

  test("commit protocol is stamped on the store: a different coordinator is rejected") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_proto")
    def lockStore() = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 10, coordinator = new LockFileCoordinator())
    lockStore().upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // stamps the protocol
    // same-protocol reopen (a NEW coordinator instance) reads fine
    assert(lockStore().versions === Seq(0L))
    // a rename-coordinator instance would treat marker-less partial
    // version dirs as committed — the stamp rejects reads AND writes
    val wrong = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 10) // defaults to RenameCoordinator
    val eRead = intercept[IllegalStateException] { wrong.versions }
    assert(eRead.getMessage.contains("commit protocol"))
    val eWrite = intercept[IllegalStateException] {
      wrong.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    }
    assert(eWrite.getMessage.contains("commit protocol"))
    // the rejected instance must not have corrupted the store
    assert(lockStore().current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap === Map(1 -> 10))
  }

  test("pre-protocol store (versions, no tag): a marker coordinator refuses instead of deleting v0") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_pretag")
    // a store written before the protocol stamp existed: committed
    // rename-protocol versions, NO _graft_commit_protocol tag
    new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"))
      .upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // v0, rename-committed
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(stateDir, "_graft_commit_protocol"))
    // opening it with LockFileCoordinator: every existing version
    // lacks the marker, so latestVersion would be None and the first
    // publish would delete the real v0 as a crashed rival's partial
    // copy — the guard must refuse the write up front
    val lockStore = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      coordinator = new LockFileCoordinator())
    val e = intercept[IllegalStateException] {
      lockStore.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    }
    assert(e.getMessage.contains("no commit-protocol tag"))
    // v0 survived intact and the legacy coordinator still reads it
    val reopened = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"))
    assert(reopened.current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap === Map(1 -> 10))
    // ...and writing through the matching (rename) coordinator
    // re-stamps the tag and proceeds normally
    reopened.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    assert(reopened.current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap === Map(1 -> 10, 2 -> 20))
  }

  test("a non-race failure (no rival commit) propagates instead of retrying") {
    val s = spark
    import s.implicits._
    val store = new ParquetStateStore(s, tmpDir("cdc_state_norace"),
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"))
    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v")) // v0
    store.beforeCommit = () =>
      throw new java.io.IOException("disk exploded (no rival committed)")
    val e = intercept[java.io.IOException] {
      store.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    }
    assert(e.getMessage.contains("disk exploded"))
    assert(store.versions === Seq(0L), "no partial commit may appear")
  }

  test("many concurrent writers all commit; no lost update; history is linear") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_many")
    val writers = (1 to 4).map { _ =>
      new ParquetStateStore(s, stateDir,
        keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
        retainVersions = 100, maxCommitRetries = 50)
    }
    val threads = writers.zipWithIndex.map { case (w, i) =>
      new Thread(() => w.upsertBatch(Seq((i, 1, i * 10)).toDF("k", "seq", "v")))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())

    val store = writers.head
    assert(store.versions === Seq(0L, 1L, 2L, 3L),
      "4 commits must serialize into 4 consecutive versions")
    val state = store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state === Map(0 -> 0, 1 -> 10, 2 -> 20, 3 -> 30))
  }

  test("a crashed writer's staging dir is inert; replaying the same batch is idempotent") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_crash")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"))
    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v"))

    // simulate a rival that died mid-merge: its private staging is on
    // disk but was never renamed into the history
    val stale = java.nio.file.Paths.get(stateDir, ".staged-dead-writer-1")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.write(stale.resolve("part-0.parquet"), Array[Byte](1, 2, 3))

    // live writers are unaffected (no lock to steal, nothing to force)
    store.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    assert(store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
      === Map(1 -> 10, 2 -> 20))

    // foreachBatch is at-least-once: the SAME batch re-applied after
    // a restart must produce identical state content
    store.upsertBatch(Seq((2, 1, 20)).toDF("k", "seq", "v"))
    assert(store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
      === Map(1 -> 10, 2 -> 20))

    // offline cleanup removes the dead writer's leftovers only
    assert(ParquetStateStore.vacuumStaging(stateDir) === 1)
    assert(!java.nio.file.Files.exists(stale))
    assert(store.current.get.count() === 2)
  }

  test("compact bin-packs the latest version; rows identical, rivals survive mid-compaction") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_compact")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"), retainVersions = 10)

    // several commits; the merge inherits shuffle partitions, so the
    // latest version is fragmented into many small files (AQE off so
    // the toy-sized state doesn't auto-coalesce to one partition —
    // at real state sizes fragmentation is the default)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try (0 until 4).foreach(b => store.upsertBatch(
      (0 until 50).map(i => (b * 50 + i, 1, b)).toDF("k", "seq", "v")))
    finally s.conf.set("spark.sql.adaptive.enabled", "true")
    val vDir = new java.io.File(s"$stateDir/v3")
    val before = vDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before > 1, s"need fragmentation to compact, got $before files")
    val expected = store.current.get.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq

    // huge target -> single file; content unchanged; new version
    val v = store.compact()
    assert(v === Some(4L))
    val compacted = new java.io.File(s"$stateDir/v4")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(compacted === 1, s"expected 1 packed file, got $compacted")
    assert(store.current.get.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq === expected)

    // a rival upsert that wins the slot mid-compaction is never lost:
    // the compactor detects the race and repacks the WINNER's state
    var fired = false
    store.beforeCommit = () => {
      if (!fired) {
        fired = true
        val rival = new ParquetStateStore(s, stateDir,
          keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"), retainVersions = 10)
        rival.upsertBatch(Seq((999, 1, 42)).toDF("k", "seq", "v")) // wins v5
      }
    }
    val v2 = store.compact()
    store.beforeCommit = () => ()
    assert(fired && v2 === Some(6L), s"compaction must retry past the rival: $v2")
    val state = store.current.get.collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(state(999) === 42, "rival's row lost by compaction")
    assert(state.size === expected.size + 1)

    // compacting an empty store is a no-op
    val empty = new ParquetStateStore(s, tmpDir("cdc_state_compact_e"),
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"))
    assert(empty.compact() === None)
  }

  test("changes(): insert/update/delete feed between retained versions") {
    val s = spark
    import s.implicits._
    val stateDir = tmpDir("cdc_state_cdf")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 10,
      deleteWhen = Some(org.apache.spark.sql.functions.col("v") < 0))

    store.upsertBatch(Seq((1, 1, 10), (2, 1, 20)).toDF("k", "seq", "v"))  // v0
    store.upsertBatch(Seq((2, 2, 21), (3, 1, 30)).toDF("k", "seq", "v"))  // v1: update 2, insert 3
    store.upsertBatch(Seq((1, 2, -1)).toDF("k", "seq", "v"))              // v2: delete 1

    def feed(a: Long, b: Long) = store.changes(a, b).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet

    assert(feed(0, 1) === Set(("update", 2, 2, 21), ("insert", 3, 1, 30)))
    // delete carries the PRE-image
    assert(feed(1, 2) === Set(("delete", 1, 1, 10)))
    // composed: the intermediate update collapses into one change
    assert(feed(0, 2) === Set(
      ("update", 2, 2, 21), ("insert", 3, 1, 30), ("delete", 1, 1, 10)))

    // identical versions -> empty feed
    store.upsertBatch(Seq((3, 1, 30)).toDF("k", "seq", "v"))              // v3: no-op merge
    assert(store.changes(2, 3).isEmpty)

    // bounds are validated loudly
    intercept[IllegalArgumentException](store.changes(2, 2))
    intercept[IllegalArgumentException](store.changes(0, 99))
  }

  test("readVersion time-travels across retained versions") {
    val s = spark
    import s.implicits._
    val store = new ParquetStateStore(s, tmpDir("cdc_state_tt"),
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 3)
    store.upsertBatch(Seq((1, 1, 10)).toDF("k", "seq", "v"))
    store.upsertBatch(Seq((1, 2, 20), (2, 1, 5)).toDF("k", "seq", "v"))
    store.upsertBatch(Seq((2, 2, 7)).toDF("k", "seq", "v"))

    assert(store.versions === Seq(0L, 1L, 2L))
    def read(v: Long) = store.readVersion(v).collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(read(0L) === Map(1 -> 10))
    assert(read(1L) === Map(1 -> 20, 2 -> 5))
    assert(read(2L) === Map(1 -> 20, 2 -> 7))
    // readVersion(latest) == current
    assert(read(2L) === store.current.get.collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap)

    // a 4th write GCs v0 (retainVersions=3): asking for it fails loud
    store.upsertBatch(Seq((3, 1, 1)).toDF("k", "seq", "v"))
    assert(store.versions === Seq(1L, 2L, 3L))
    val err = intercept[IllegalArgumentException](store.readVersion(0L))
    assert(err.getMessage.contains("not retained"))
  }

  test("retention deletes versions beyond the last k and state still reads back") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val stateDir = tmpDir("cdc_state_gc")
    val ckpt = tmpDir("cdc_ckpt_gc")
    val store = new ParquetStateStore(s, stateDir,
      keys = Seq("k"), seqCols = Seq("seq"), payload = Seq("v"),
      retainVersions = 2)

    val input = MemoryStream[(Int, Int, Int)]
    // 4 rounds -> versions v0..v3; only v2, v3 may survive
    (1 to 4).foreach { round =>
      input.addData((1, round, round * 10))
      CdcStream.run(input.toDS.toDF("k", "seq", "v"), store, ckpt).awaitTermination()
    }
    val dirs = new java.io.File(stateDir).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    assert(dirs === Seq("v2", "v3"), s"version dirs after GC: $dirs")
    // latest state must still be fully readable after the deletes
    val state = store.current.get.collect().map(r => (r.getInt(0), r.getInt(2)))
    assert(state.toSeq === Seq((1, 40)))
  }
}
