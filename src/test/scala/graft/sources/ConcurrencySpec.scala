package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Optimistic multi-writer concurrency on the stats table: the
  * token-protocol generation commit serializes racing
  * DML/maintenance ops (the loser re-runs against the winner's
  * state — write-serializable, Delta's OCC shape), and concurrent
  * appends ride forward into a racing op's new generation instead
  * of being silently dropped.
  *
  * These cases drive REAL thread races repeatedly and assert the
  * FINAL state only — correct under every interleaving, so the
  * assertions are deterministic even though the schedules are not.
  */
class ConcurrencySpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_occ").toString

  private def inParallel(bodies: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(bodies.size)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val futures = bodies.map { b =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try b() catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    if (!failures.isEmpty) throw failures.peek()
  }

  test("racing disjoint DELETEs both commit: losers re-run, no rows lost or resurrected") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    val n = 8000L
    DataSkipping.writeWithStats(
      (0L until n).map(i => (i, i % 100)).toDF("id", "k")
        .repartitionByRange(8, col("id")), t, Seq("id"))
    // 4 writers x 3 rounds of disjoint 100-id band deletes, all racing
    val bands = for (w <- 0 until 4; r <- 0 until 3) yield (w, r)
    (0 until 3).foreach { r =>
      inParallel((0 until 4).map { w => () =>
        val lo = (w * 3 + r) * 100L
        val gone = DataSkipping.deleteWhere(s, t,
          col("id") >= lo && col("id") < lo + 100L, vacuum = false)
        assert(gone === 100L, s"writer $w round $r deleted $gone")
      })
    }
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() ===
      n - bands.size * 100L)
    // every op landed as its own committed generation (12 deletes)
    val ops = DataSkipping.describeHistory(s, t)
      .select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "DELETE") === 12, ops.mkString(","))
    // version numbers are distinct committed generations
    val vs = DataSkipping.tableVersions(s, t)
    assert(vs.distinct.size === vs.size)
  }

  test("racing OVERWRITEs serialize: each commits its own generation, content is one whole batch") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, "base")).toDF("id", "tag"), t, Seq("id"))
    inParallel(Seq(
      () => DataSkipping.writeWithStats(
        (1000L until 1200L).map(i => (i, "a")).toDF("id", "tag"), t, Seq("id")),
      () => DataSkipping.writeWithStats(
        (2000L until 2300L).map(i => (i, "b")).toDF("id", "tag"), t, Seq("id"))))
    // the loser re-ran against the winner's state and replaced it:
    // the final table is EXACTLY one writer's whole batch
    val tags = DataSkipping.readSkipping(s, t, lit(true))
      .select("tag").distinct().collect().map(_.getString(0)).toSet
    assert(tags.size === 1 && (tags("a") || tags("b")), tags.toString)
    val n = DataSkipping.readSkipping(s, t, lit(true)).count()
    assert(n === 200L || n === 300L)
    assert((tags("a") && n == 200L) || (tags("b") && n == 300L))
    // both overwrites committed as their own generation
    val ops = DataSkipping.describeHistory(s, t)
      .select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "OVERWRITE") === 2, ops.mkString(","))
    assert(DataSkipping.tableVersions(s, t) === Seq(0L, 1L, 2L))
    // every superseded state still time-travels whole
    assert(DataSkipping.readSkippingAt(s, t, 0L, lit(true)).count() === 500L)
    assert(DataSkipping.readSkippingAt(s, t, 1L, lit(true)).count() === 200L ||
      DataSkipping.readSkippingAt(s, t, 1L, lit(true)).count() === 300L)
  }

  test("a named append racing OVERWRITE lands in one of the two serial orders; replays stay once-only") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 400L).map(i => (i, "old")).toDF("id", "tag"), t, Seq("id"))
    inParallel(Seq(
      () => DataSkipping.writeWithStats(
        (5000L until 5100L).map(i => (i, "new")).toDF("id", "tag"),
        t, Seq("id")),
      () => DataSkipping.appendWithStats(
        (9000L until 9050L).map(i => (i, "app")).toDF("id", "tag"),
        t, Seq("id"), commitName = Some("race-batch"))))
    val byTag = DataSkipping.readSkipping(s, t, lit(true))
      .groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // overwrite content always present; the append either serialized
    // BEFORE (its rows replaced — gone) or AFTER (its rows survive);
    // the base is always replaced
    assert(byTag.getOrElse("new", 0L) === 100L, byTag.toString)
    assert(!byTag.contains("old"), byTag.toString)
    assert(byTag.getOrElse("app", 0L) === 0L || byTag("app") === 50L)
    // a replay of the named batch is a NO-OP in either order: the
    // marker rode verbatim (append-after) or folded to zero-row
    // (append-before) — both short-circuit at-least-once writers
    val before = DataSkipping.readSkipping(s, t, lit(true)).count()
    DataSkipping.appendWithStats(
      (9000L until 9050L).map(i => (i, "app")).toDF("id", "tag"),
      t, Seq("id"), commitName = Some("race-batch"))
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === before,
      "a replayed named batch must not re-deliver across an overwrite")
  }

  test("named appends racing compaction are never lost and never double-delivered") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, i)).toDF("id", "v")
        .repartitionByRange(8, col("id")), t, Seq("id"))
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    (0 until 4).foreach { round =>
      inParallel(Seq(
        () => { // appender: two named commits per round
          (0 until 2).foreach { j =>
            val base = 1000000L + (round * 2 + j) * 1000L
            assert(DataSkipping.appendWithStats(
              (base until base + 500L).map(i => (i, i)).toDF("id", "v")
                .coalesce(1),
              t, Seq("id"), commitName = Some(s"occ-$round-$j")))
            appended.add(base)
          }
        },
        () => { // compactor: full fold racing the appends
          DataSkipping.compactTable(s, t,
            targetFileBytes = 4L * 1024 * 1024, vacuum = false)
          ()
        }))
    }
    val total = DataSkipping.readSkipping(s, t, lit(true)).count()
    assert(total === 4000L + 8 * 500L,
      s"expected exactly-once delivery of all named appends, got $total")
    // every appended batch individually present exactly once
    appended.toArray(Array.empty[java.lang.Long]).foreach { b =>
      val c = DataSkipping.readSkipping(s, t,
        col("id") >= b.longValue && col("id") < b.longValue + 500L).count()
      assert(c === 500L, s"batch at $b delivered $c rows")
    }
    // a replay of any marker still short-circuits after the races
    assert(!DataSkipping.appendWithStats(
      (1000000L until 1000500L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      t, Seq("id"), commitName = Some("occ-0-0")))
  }

  test("named appends racing DML keep both effects; append data never half-applies") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 6000L).map(i => (i, 0L)).toDF("id", "mark")
        .repartitionByRange(6, col("id")), t, Seq("id"))
    (0 until 4).foreach { round =>
      inParallel(Seq(
        () => {
          val base = 2000000L + round * 1000L
          assert(DataSkipping.appendWithStats(
            (base until base + 400L).map(i => (i, 9L)).toDF("id", "mark")
              .coalesce(1),
            t, Seq("id"), commitName = Some(s"dml-occ-$round")))
        },
        () => {
          val lo = round * 500L
          val updated = DataSkipping.updateWhere(s, t,
            col("id") >= lo && col("id") < lo + 500L,
            Map("mark" -> lit(round.toLong + 1L)), vacuum = false)
          assert(updated === 500L, s"round $round updated $updated")
        }))
    }
    // all four updates applied
    (0 until 4).foreach { r =>
      assert(DataSkipping.readSkipping(s, t,
        col("mark") === (r + 1L) && col("id") < 6000L).count() === 500L)
    }
    // all four appends delivered exactly once
    assert(DataSkipping.readSkipping(s, t, col("id") >= 2000000L).count()
      === 4 * 400L)
    assert(DataSkipping.readSkipping(s, t, lit(true)).count()
      === 6000L + 1600L)
  }

  test("DML racing OPTIMIZE: compaction stays content-invisible under every interleaving") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    val n = 6000L
    DataSkipping.writeWithStats(
      (0L until n).map(i => (i, i % 100)).toDF("id", "k")
        .repartitionByRange(12, col("id")), t, Seq("id"))
    // 3 rounds of a band DELETE racing a full compaction: whichever
    // serialization the commit protocol picks, OPTIMIZE must never
    // resurrect deleted rows or drop live ones — the final content is
    // DETERMINISTIC even though the schedule is not
    (0 until 3).foreach { r =>
      inParallel(Seq(
        () => {
          val lo = r * 200L
          val gone = DataSkipping.deleteWhere(s, t,
            col("id") >= lo && col("id") < lo + 200L, vacuum = false)
          assert(gone === 200L, s"round $r deleted $gone")
        },
        () => {
          DataSkipping.compactTable(s, t,
            targetFileBytes = 4L * 1024 * 1024, vacuum = false)
          ()
        }))
    }
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === n - 600L)
    assert(DataSkipping.readSkipping(s, t, col("id") < 600L).count() === 0L)
    val ops = DataSkipping.describeHistory(s, t)
      .select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "DELETE") === 3, ops.mkString(","))
    // both op families committed their generations
    assert(ops.exists(o => o != "WRITE" && o != "DELETE"),
      s"compactions must appear in history: ${ops.mkString(",")}")
  }

  test("named appends racing partition-scoped OPTIMIZE WHERE: exactly-once, content-invisible") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, i % 4)).toDF("id", "p")
        .repartition(4), t, Seq("id"), bloomCols = Nil,
      partitionBy = Seq("p"))
    (0 until 3).foreach { round =>
      inParallel(Seq(
        () => {
          val base = 3000000L + round * 1000L
          assert(DataSkipping.appendWithStats(
            (base until base + 400L).map(i => (i, i % 4)).toDF("id", "p")
              .coalesce(1),
            t, Seq("id"), commitName = Some(s"optw-occ-$round")))
        },
        () => {
          DataSkipping.compactWhere(s, t, col("p") === (round.toLong % 4),
            targetFileBytes = 4L * 1024 * 1024, vacuum = false)
          ()
        }))
    }
    assert(DataSkipping.readSkipping(s, t, lit(true)).count()
      === 4000L + 3 * 400L)
    // every appended batch present exactly once, scoped compaction
    // never resurrected or dropped a partition's rows
    (0 until 3).foreach { round =>
      val base = 3000000L + round * 1000L
      assert(DataSkipping.readSkipping(s, t,
        col("id") >= base && col("id") < base + 400L).count() === 400L)
    }
    (0L until 4L).foreach { p =>
      assert(DataSkipping.readSkipping(s, t, col("p") === p).count() ===
        1000L + 3 * 100L, s"partition $p")
    }
  }

  test("DML racing RESTORE: final content equals the serial replay of the committed order") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    val n = 4000L
    DataSkipping.writeWithStats(
      (0L until n).map(i => (i, i % 10)).toDF("id", "k")
        .repartitionByRange(8, col("id")), t, Seq("id"))         // v0
    assert(DataSkipping.deleteWhere(s, t,
      col("id") >= 0L && col("id") < 300L, vacuum = false) === 300L) // v1
    // race: a band DELETE against RESTORE to v1. The outcome is
    // schedule-dependent (restore-last resurrects the band,
    // delete-last removes it) — but it must equal the serial replay
    // of whatever order the commit protocol recorded. Anything else
    // (half-applied delete, restore reading a torn state) fails.
    inParallel(Seq(
      () => {
        DataSkipping.deleteWhere(s, t,
          col("id") >= 1000L && col("id") < 1300L, vacuum = false)
        ()
      },
      () => {
        DataSkipping.restoreTable(s, t, 1L)
        ()
      }))
    val ops = DataSkipping.describeHistory(s, t)
      .orderBy("version").select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "DELETE") === 2 &&
      ops.count(_.startsWith("RESTORE")) === 1, ops.mkString(","))
    val deleteLast =
      ops.lastIndexOf("DELETE") > ops.lastIndexWhere(_.startsWith("RESTORE"))
    val expected = if (deleteLast) n - 300L - 300L else n - 300L
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === expected,
      s"history ${ops.mkString(",")} must replay to $expected rows")
    assert(DataSkipping.readSkipping(s, t,
      col("id") >= 1000L && col("id") < 1300L).count() ===
      (if (deleteLast) 0L else 300L))
    // the restored band from v1's perspective stays deleted either way
    assert(DataSkipping.readSkipping(s, t, col("id") < 300L).count() === 0L)
  }

  test("a committed generation displaced by reclaim is restored when its slot is free") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i)).toDF("id", "v").coalesce(2),
      t, Seq("id"))
    assert(DataSkipping.deleteWhere(s, t, col("id") < 100L,
      vacuum = false) === 100L) // v1, committed
    val fs = new Path(t).getFileSystem(s.sparkContext.hadoopConfiguration)
    val statsDir = new Path(s"$t/${DataSkipping.StatsDir}")
    val gen = new Path(statsDir, "v1")
    // simulate the reclaim instant: the committed generation sits in
    // the reclaimer's aside dir, the slot is empty
    val aside = new Path(statsDir, ".reclaim-v1-test")
    assert(fs.rename(gen, aside))
    DataSkipping.restoreCommitted(fs, gen, aside)
    assert(fs.exists(new Path(gen, DataSkipping.CommitFile)))
    assert(!fs.exists(new Path(gen, aside.getName)), "restore must not nest")
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 900L)
  }

  test("a committed generation whose slot was re-won by a third writer is loudly quarantined, never nested or silently absent") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i)).toDF("id", "v").coalesce(2),
      t, Seq("id"))
    assert(DataSkipping.deleteWhere(s, t, col("id") < 100L,
      vacuum = false) === 100L) // v1, committed
    val fs = new Path(t).getFileSystem(s.sparkContext.hadoopConfiguration)
    val statsDir = new Path(s"$t/${DataSkipping.StatsDir}")
    val gen = new Path(statsDir, "v1")
    val asideName = ".reclaim-v1-test"
    val aside = new Path(statsDir, asideName)
    assert(fs.rename(gen, aside))
    // a third writer occupies the freed slot and COMMITS before the
    // rename-back — the interleaving that used to NEST the displaced
    // generation invisibly inside the winner's dir
    fs.mkdirs(gen)
    fs.create(new Path(gen, DataSkipping.CommitFile), false).close()
    DataSkipping.restoreCommitted(fs, gen, aside)
    // the winner's commit is untouched; the displaced generation's
    // files are parked VISIBLY at parent level, not nested, not gone
    assert(fs.exists(new Path(gen, DataSkipping.CommitFile)))
    assert(fs.listStatus(gen).forall(f => !f.isDirectory),
      "displaced generation must not be nested inside the winner's dir")
    val parked = fs.listStatus(statsDir)
      .filter(_.getPath.getName.startsWith("_displaced-v1-"))
    assert(parked.length === 1, "displaced generation parked at parent level")
    assert(fs.exists(new Path(parked.head.getPath, DataSkipping.CommitFile)),
      "parked dir holds the complete committed generation")
    assert(fs.listStatus(parked.head.getPath)
      .exists(_.getPath.getName.endsWith(".parquet")),
      "parked generation keeps its manifest rows readable")
  }

  // --- conflict-checked commits: disjoint races rebase, not re-run ---

  test("disjoint DELETE x OPTIMIZE WHERE: the loser rebases at the commit point — both ops execute exactly once") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    val n = 8000L
    DataSkipping.writeWithStats(
      (0L until n).map(i => (i, i % 100)).toDF("id", "k")
        .repartitionByRange(8, col("id")), t, Seq("id"))
    DataSkipping.opRewriteRuns.remove(t)
    DataSkipping.rebaseCommits.remove(t)
    // DETERMINISTIC lost race: the DELETE (low band) is paused at its
    // publish point while a disjoint OPTIMIZE WHERE (high band)
    // commits the generation it targeted — the DELETE's first publish
    // MUST lose, and the conflict check MUST absorb the loss by
    // rebasing instead of re-running the delete
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    DataSkipping.prePublishHook = (op, p) =>
      if (op == "DELETE" && p == t && fired.compareAndSet(false, true))
        DataSkipping.compactWhere(s, t, col("id") >= 4000L,
          targetFileBytes = 64L * 1024 * 1024, vacuum = false)
    try {
      val gone = DataSkipping.deleteWhere(s, t,
        col("id") >= 0L && col("id") < 500L, vacuum = false)
      assert(gone === 500L)
    } finally DataSkipping.prePublishHook = (_, _) => ()
    assert(fired.get, "the race was never staged")
    // exactly one heavy body execution per op — the lost race cost a
    // rebase (manifest-only), never a re-run of the delete's rewrite
    assert(DataSkipping.opRewriteRuns.get(t).get === 2L,
      "disjoint race must not re-run either op body")
    assert(DataSkipping.rebaseCommits.get(t).get === 1L,
      "the lost race must be absorbed by a commit-point rebase")
    // both effects present: the band is gone AND the high half was
    // compacted away to fewer files
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === n - 500L)
    assert(DataSkipping.readSkipping(s, t, col("id") < 500L).count() === 0L)
    val ops = DataSkipping.describeHistory(s, t)
      .orderBy("version").select("operation").collect().map(_.getString(0))
    assert(ops === Array("WRITE", "OPTIMIZE WHERE", "DELETE"), ops.mkString(","))
    // the rebased generation time-travels like any other
    assert(DataSkipping.readSkippingAt(s, t, 1L, lit(true)).count() === n)
  }

  test("overlapping DELETE x UPDATE: the conflict check refuses the rebase and the loser re-runs against the winner") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, 0L)).toDF("id", "mark")
        .repartitionByRange(8, col("id")), t, Seq("id"))
    DataSkipping.opRewriteRuns.remove(t)
    DataSkipping.rebaseCommits.remove(t)
    // the UPDATE rewrites the very files the paused DELETE touched —
    // NOT disjoint: the rebase must be refused and the delete must
    // re-run against the winner's state (write-serializable order:
    // UPDATE then DELETE)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    DataSkipping.prePublishHook = (op, p) =>
      if (op == "DELETE" && p == t && fired.compareAndSet(false, true))
        assert(DataSkipping.updateWhere(s, t,
          col("id") >= 0L && col("id") < 500L,
          Map("mark" -> lit(7L)), vacuum = false) === 500L)
    try {
      val gone = DataSkipping.deleteWhere(s, t,
        col("id") >= 250L && col("id") < 750L, vacuum = false)
      assert(gone === 500L)
    } finally DataSkipping.prePublishHook = (_, _) => ()
    assert(fired.get, "the race was never staged")
    assert(DataSkipping.rebaseCommits.get(t) == null,
      "an overlapping race must NOT rebase")
    // UPDATE ran once, DELETE ran twice (lost attempt + serial re-run)
    assert(DataSkipping.opRewriteRuns.get(t).get === 3L)
    // final content = serial replay UPDATE-then-DELETE
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 3500L)
    assert(DataSkipping.readSkipping(s, t,
      col("id") >= 250L && col("id") < 750L).count() === 0L)
    assert(DataSkipping.readSkipping(s, t, col("mark") === 7L).count() === 250L)
    val ops = DataSkipping.describeHistory(s, t)
      .orderBy("version").select("operation").collect().map(_.getString(0))
    assert(ops === Array("WRITE", "UPDATE", "DELETE"), ops.mkString(","))
  }

  test("merge-on-read DELETE racing a disjoint OPTIMIZE WHERE rebases with its deletion vector intact") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 6000L).map(i => (i, i % 10)).toDF("id", "k")
        .repartitionByRange(6, col("id")), t, Seq("id"))
    DataSkipping.opRewriteRuns.remove(t)
    DataSkipping.rebaseCommits.remove(t)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    DataSkipping.prePublishHook = (op, p) =>
      if (op == "DELETE" && p == t && fired.compareAndSet(false, true))
        DataSkipping.compactWhere(s, t, col("id") >= 3000L,
          targetFileBytes = 64L * 1024 * 1024, vacuum = false)
    try {
      val gone = DataSkipping.deleteWhereDV(s, t,
        col("id") >= 100L && col("id") < 400L, vacuum = false)
      assert(gone === 300L)
    } finally DataSkipping.prePublishHook = (_, _) => ()
    assert(fired.get, "the race was never staged")
    assert(DataSkipping.rebaseCommits.get(t).get === 1L)
    assert(DataSkipping.opRewriteRuns.get(t).get === 2L)
    // the rebased generation carries the vector: rows invisible, file
    // bytes untouched, and a later purge still materializes it
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 5700L)
    assert(DataSkipping.readSkipping(s, t,
      col("id") >= 100L && col("id") < 400L).count() === 0L)
    assert(DataSkipping.purgeDeletionVectors(s, t, vacuum = false) === 300L)
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 5700L)
  }

  test("MERGE racing a disjoint OPTIMIZE WHERE rebases on its key envelope; an in-envelope winner forces the re-run") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 8000L).map(i => (i, i)).toDF("id", "v")
        .repartitionByRange(8, col("id")), t, Seq("id"))
    DataSkipping.opRewriteRuns.remove(t)
    DataSkipping.rebaseCommits.remove(t)
    // the CDC shape: a keyed merge whose source envelope is one band
    // (updates + in-band inserts), racing compaction of a FAR band —
    // the winner's rewritten files sit outside the envelope, so the
    // merge must absorb the loss at the commit point
    val src = (100L until 600L by 2L).map(i => (i, -i)).toDF("id", "v")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    DataSkipping.prePublishHook = (op, p) =>
      if (op == "MERGE" && p == t && fired.compareAndSet(false, true))
        DataSkipping.compactWhere(s, t, col("id") >= 4000L,
          targetFileBytes = 64L * 1024 * 1024, vacuum = false)
    try {
      val (matched, inserted) =
        DataSkipping.mergeUpsert(s, t, src, Seq("id"), vacuum = false)
      assert(matched === 250L && inserted === 0L)
    } finally DataSkipping.prePublishHook = (_, _) => ()
    assert(fired.get, "the race was never staged")
    assert(DataSkipping.rebaseCommits.get(t).get === 1L,
      "a disjoint-envelope MERGE race must rebase")
    assert(DataSkipping.opRewriteRuns.get(t).get === 2L)
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 8000L)
    assert(DataSkipping.readSkipping(s, t, col("v") < 0L).count() === 250L)
    assert(DataSkipping.readSkipping(s, t,
      col("id") >= 4000L && col("v") =!= col("id")).count() === 0L,
      "compaction must stay content-invisible under the rebase")
    val ops = DataSkipping.describeHistory(s, t)
      .orderBy("version").select("operation").collect().map(_.getString(0))
    assert(ops === Array("WRITE", "OPTIMIZE WHERE", "MERGE"), ops.mkString(","))

    // the refusal side: a winner that rewrites files INSIDE the
    // envelope (even without touching the merged rows' files) must
    // force the serial re-run — its new files' stats overlap the
    // merge's read scope
    DataSkipping.opRewriteRuns.remove(t)
    DataSkipping.rebaseCommits.remove(t)
    val src2 = (200L until 300L).map(i => (i, 77L)).toDF("id", "v")
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    DataSkipping.prePublishHook = (op, p) =>
      if (op == "MERGE" && p == t && fired2.compareAndSet(false, true))
        assert(DataSkipping.updateWhere(s, t,
          col("id") >= 250L && col("id") < 280L,
          Map("v" -> lit(-999L)), vacuum = false) === 30L)
    try {
      val (m2, _) = DataSkipping.mergeUpsert(s, t, src2, Seq("id"),
        vacuum = false)
      assert(m2 === 100L)
    } finally DataSkipping.prePublishHook = (_, _) => ()
    assert(fired2.get)
    assert(DataSkipping.rebaseCommits.get(t) == null,
      "an in-envelope winner must NOT rebase")
    // serial order UPDATE-then-MERGE: the merge's values win
    assert(DataSkipping.readSkipping(s, t,
      col("id") >= 200L && col("id") < 300L && col("v") === 77L).count() === 100L)
    assert(DataSkipping.readSkipping(s, t, col("v") === -999L).count() === 0L)
  }

  test("randomized disjoint DML races: table equals the shadow model after every round (rebase or retry alike)") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    val n = 9000L
    DataSkipping.writeWithStats(
      (0L until n).map(i => (i, 0L)).toDF("id", "mark")
        .repartitionByRange(9, col("id")), t, Seq("id"))
    var shadow: Map[Long, Long] = (0L until n).map(_ -> 0L).toMap
    val rnd = new scala.util.Random(181)
    (0 until 5).foreach { round =>
      // three ops over three DISJOINT 300-id bands, racing: disjoint
      // effects commute, so the shadow applies them in any order
      val bands = rnd.shuffle((0 until 10).toList).take(3)
        .map(b => b * 900L + rnd.nextInt(3) * 300L)
      val ops: Seq[() => Unit] = bands.zipWithIndex.map { case (lo, i) =>
        (round + i) % 3 match {
          case 0 => () =>
            DataSkipping.deleteWhere(s, t,
              col("id") >= lo && col("id") < lo + 300L, vacuum = false); ()
          case 1 => () =>
            DataSkipping.updateWhere(s, t,
              col("id") >= lo && col("id") < lo + 300L,
              Map("mark" -> lit(round * 10L + i)), vacuum = false); ()
          case _ => () =>
            // keyed merge: upsert the band's surviving keys (matched
            // rows take the new mark; keys deleted by EARLIER rounds
            // re-insert — the shadow replays the same upsert rule)
            DataSkipping.mergeUpsert(s, t,
              (lo until lo + 300L).map(id => (id, round * 100L + i))
                .toDF("id", "mark"),
              Seq("id"), vacuum = false); ()
        }
      }
      inParallel(ops)
      bands.zipWithIndex.foreach { case (lo, i) =>
        (round + i) % 3 match {
          case 0 =>
            shadow = shadow.filter { case (k, _) => k < lo || k >= lo + 300L }
          case 1 =>
            shadow = shadow.map { case (k, v) =>
              k -> (if (k >= lo && k < lo + 300L) round * 10L + i else v) }
          case _ =>
            shadow = shadow ++
              (lo until lo + 300L).map(id => id -> (round * 100L + i))
        }
      }
      val got = DataSkipping.readSkipping(s, t, lit(true))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === shadow, s"diverged from shadow after round $round")
    }
  }

  test("a stray nested build from a lost race is cleaned and invisible") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i)).toDF("id", "v").coalesce(2),
      t, Seq("id"))
    // burst of same-target compactions: every loser must clean up
    inParallel((0 until 3).map { _ => () =>
      DataSkipping.compactTable(s, t, targetFileBytes = 1L * 1024 * 1024,
        vacuum = false); ()
    })
    val fs = new Path(t).getFileSystem(s.sparkContext.hadoopConfiguration)
    val statsDir = new Path(s"$t/${DataSkipping.StatsDir}")
    // no generation dir contains a nested .genbuild stray
    fs.listStatus(statsDir).filter(_.isDirectory).foreach { g =>
      val nested = fs.listStatus(g.getPath)
        .filter(f => f.isDirectory && f.getPath.getName.startsWith(".genbuild-"))
      assert(nested.isEmpty,
        s"stray nested build under ${g.getPath}: ${nested.map(_.getPath.getName).mkString(",")}")
    }
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 1000L)
  }
}
