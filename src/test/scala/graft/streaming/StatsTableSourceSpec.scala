package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class StatsTableSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def drain(s: org.apache.spark.sql.SparkSession, table: String,
      outDir: String, ckpt: String): Unit = {
    val q = s.readStream
      .format(classOf[StatsTableSourceProvider].getName)
      .option("path", table).load()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("named commits stream incrementally; replays and restarts are exactly-once") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_tbl") + "/t"
    val outDir = tmpDir("stsrc_out") + "/o"
    val ckpt = tmpDir("stsrc_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 100L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-w1-b0")))
    assert(DataSkipping.appendWithStats(
      (100L until 150L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-w1-b1")))

    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).count() === 150)

    // an at-least-once writer REPLAYS b1: the marker short-circuits,
    // no new commit appears, and the next drain moves nothing
    assert(!DataSkipping.appendWithStats(
      (100L until 150L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-w1-b1")))
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).count() === 150, "replayed commit must not re-stream")

    // a genuinely new commit streams exactly its own rows, and an
    // EMPTY commit (zero-row marker) drains without error
    assert(DataSkipping.appendWithStats(
      (150L until 170L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-w1-b2")))
    assert(DataSkipping.appendWithStats(
      (0L until 0L).map(i => (i, i)).toDF("id", "v"),
      table, Seq("id"), commitName = Some("commit-w1-b3")))
    drain(s, table, outDir, ckpt)
    val ids = s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 170L).toSeq,
      "restart must deliver exactly the new commits, once")
  }

  test("discovery is manifest-driven: crash orphans in the table dir are never streamed") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_orph") + "/t"
    val outDir = tmpDir("stsrc_orph_out") + "/o"
    val ckpt = tmpDir("stsrc_orph_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 50L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-a")))
    // a crashed append: data files land, no manifest commit — a plain
    // file stream over the directory would ingest these
    (1000L until 1100L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(table)
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 50L).toSeq,
      "orphans without a commit must be invisible to the stream")
  }

  test("fresh consumer on a compacted table starts from the snapshot; marker expiry bounds listings") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_snap") + "/t"
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 80L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-s-b0")))
    assert(DataSkipping.appendWithStats(
      (80L until 120L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-s-b1")))
    // compaction folds both commits' rows into plain parts (markers
    // re-created zero-row, still young enough to survive)
    assert(DataSkipping.compactTable(s, table, targetFileBytes = 1L << 30,
      retentionMs = 0L) > 0)

    // a BRAND-NEW consumer must start from the current snapshot, not
    // silently consume the zero-row markers as its entire history
    val out1 = tmpDir("stsrc_snap_o1") + "/o"
    val ckpt1 = tmpDir("stsrc_snap_c1")
    drain(s, table, out1, ckpt1)
    assert(s.read.parquet(out1).select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 120L).toSeq,
      "fresh consumer must receive the folded history as its first snapshot batch")

    // ...and new commits after the snapshot still stream incrementally
    assert(DataSkipping.appendWithStats(
      (120L until 150L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-s-b2")))
    drain(s, table, out1, ckpt1)
    assert(s.read.parquet(out1).count() === 150)

    // markerRetentionMs = 0 expires every marker at the next
    // REWRITING compact (the Delta txn-retention analog): the
    // manifest listing is bounded, and a fresh consumer still gets
    // everything via the snapshot
    assert(DataSkipping.compactTable(s, table, targetFileBytes = 1L << 30,
      retentionMs = 0L, markerRetentionMs = 0L) > 0)
    val dir = new java.io.File(new java.net.URI(DataSkipping.manifestDir(s, table)).getPath)
    assert(!dir.listFiles().exists(_.getName.startsWith("commit-")),
      "expired markers must leave the manifest")
    val out2 = tmpDir("stsrc_snap_o2") + "/o"
    drain(s, table, out2, tmpDir("stsrc_snap_c2"))
    assert(s.read.parquet(out2).count() === 150)
  }

  test("row-level DML preserves unaffected commits verbatim: an in-flight consumer still gets its pending batch") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_dml") + "/t"
    val outDir = tmpDir("stsrc_dml_out") + "/o"
    val ckpt = tmpDir("stsrc_dml_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 100L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-d-b0")))
    drain(s, table, outDir, ckpt) // consumer caught up through b0

    assert(DataSkipping.appendWithStats(
      (100L until 200L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-d-b1")))
    // DML lands while the consumer still owes b1: the delete touches
    // only b0's file, so b1's marker must survive VERBATIM (a fold to
    // zero-row would silently empty the pending batch)
    assert(DataSkipping.deleteWhere(s, table, col("id") < 50L) === 50L)

    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 200L).toSeq,
      "the pending commit must deliver its full batch across the DML generation; " +
        "already-delivered rows are not retracted (skip-change semantics)")

    // a FRESH consumer starts from the post-DML snapshot
    val out2 = tmpDir("stsrc_dml_o2") + "/o"
    drain(s, table, out2, tmpDir("stsrc_dml_c2"))
    assert(s.read.parquet(out2).select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (50L until 200L).toSeq,
      "fresh consumers see the post-DML state: folded b0 survivors via parts, b1 verbatim")
  }

  test("restore preserves a pending commit marker verbatim: the consumer's owed batch replays its rows") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_rst") + "/t"
    val outDir = tmpDir("stsrc_rst_out") + "/o"
    val ckpt = tmpDir("stsrc_rst_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 100L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-r-b0")))
    drain(s, table, outDir, ckpt) // caught up through b0

    // b1 lands, then DML commits v1, then the table is RESTORED to
    // v0 — all while the consumer still owes b1. The restored
    // generation holds b1's marker with its rows (appends landed
    // inside v0), so the owed batch must replay in full.
    assert(DataSkipping.appendWithStats(
      (100L until 200L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-r-b1")))
    assert(DataSkipping.deleteWhere(s, table, col("id") < 50L) === 50L) // v1
    DataSkipping.restoreTable(s, table, 0L) // v2 == pre-delete state

    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 200L).toSeq,
      "the pending commit must replay its exact rows across the restore")

    // a replay of either commit still short-circuits post-restore
    assert(!DataSkipping.appendWithStats(
      (0L until 100L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-r-b0")))
    assert(!DataSkipping.appendWithStats(
      (100L until 200L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("commit-r-b1")))
    // and a fresh consumer sees exactly the restored state
    val out2 = tmpDir("stsrc_rst_o2") + "/o"
    drain(s, table, out2, tmpDir("stsrc_rst_c2"))
    assert(s.read.parquet(out2).select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 200L).toSeq)
  }

  test("pipeline silver→gold chained through manifest commits, exactly-once across runs") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("stsrc_pipe_src")
    val root = tmpDir("stsrc_pipe_root")

    def runPipeline(): Map[String, org.apache.spark.sql.DataFrame] = {
      val p = new StreamingPipeline(s, root)
      p.source("bronze")(FileIngest.stream(s, srcDir, schema, format = "parquet"))
      // silver: stats-backed — every micro-batch is a named manifest
      // commit, immediately prunable storage
      p.statsTable("silver", Seq("id"), "bronze") { d =>
        d("bronze").filter(col("v") % 3 =!= 0)
      }
      // gold consumes silver THROUGH the manifest source (one commit
      // = one downstream batch), not via directory listing
      p.table("gold", "silver") { d =>
        d("silver").withColumn("vv", col("v") * 10)
      }
      p.runOnce()
    }

    (0L until 200L).map(i => (i, i)).toDF("id", "v")
      .coalesce(2).write.mode("append").parquet(srcDir)
    runPipeline()
    val expected1 = (0L until 200L).filter(_ % 3 != 0)
    assert(s.read.parquet(s"$root/gold/data").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === expected1)

    // silver's storage really is a manifest table with named commits
    val silverManifest = DataSkipping.manifestDir(s, s"$root/silver/data")
    assert(new java.io.File(new java.net.URI(silverManifest).getPath match {
      case "" => silverManifest
      case p => p
    }).listFiles().exists(f => f.getName.startsWith("commit-")),
      "silver batches must land as named manifest commits")

    // crash orphan in silver's dir: gold must never see it
    (9000L until 9050L).map(i => (i, i + 1)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$root/silver/data")

    // second wave of source data, fresh pipeline instance (restart):
    // only the NEW data flows, exactly once, orphan excluded
    (200L until 300L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val built = runPipeline()
    val expected2 = (0L until 300L).filter(_ % 3 != 0)
    assert(s.read.parquet(s"$root/gold/data").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === expected2,
      "restart must process exactly the new wave; orphans stay invisible")
    // the pipeline's batch view of silver is the manifest view —
    // orphan-free, prunable
    assert(built("silver").select("id").collect().map(_.getLong(0)).sorted.toSeq
      === expected2)
    val (kept, all) = DataSkipping.prunedFiles(s, s"$root/silver/data",
      col("id") < 10L)
    assert(kept.size < all.size, "silver must prune like any stats table")
  }

  test("pipeline with a PARTITIONED silver: batches route to partition dirs and stream onward with values intact") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("stsrc_ppart_src")
    val root = tmpDir("stsrc_ppart_root")
    val pSchema = StructType(Seq(
      StructField("id", LongType), StructField("p", LongType),
      StructField("v", LongType)))
    def runPipeline(): Unit = {
      val pl = new StreamingPipeline(s, root)
      pl.source("bronze")(
        FileIngest.stream(s, srcDir, pSchema, format = "parquet"))
      // silver is a PARTITIONED stats table: the bootstrap writes the
      // partition sidecar, each micro-batch routes rows into `p=<k>`
      // dirs, and gold consumes the commits through the part-aware
      // manifest source — a partition-blind read would feed gold NULLs
      pl.statsTablePartitioned("silver", Seq("id"), Seq("p"), "bronze") { d =>
        d("bronze").filter(col("v") % 2 === 0)
      }
      pl.table("gold", "silver") { d =>
        d("silver").withColumn("vp", col("v") * col("p"))
      }
      pl.runOnce()
      ()
    }
    (0L until 120L).map(i => (i, i % 3, i)).toDF("id", "p", "v")
      .coalesce(2).write.mode("append").parquet(srcDir)
    runPipeline()
    val silver = s"$root/silver/data"
    assert(DataSkipping.tablePartitionColumns(s, silver) === Seq("p"))
    val gold1 = s.read.parquet(s"$root/gold/data")
    assert(gold1.count() === 60)
    assert(gold1.filter(col("p").isNull).count() === 0,
      "partition values must survive silver -> gold streaming")
    assert(gold1.filter(col("p") === 1L).count() === 20)
    assert(gold1.filter(col("id") === 8L).head.getAs[Long]("vp") === 16L)

    // second wave, fresh pipeline instance (restart): exactly-once,
    // partition routing and value service still correct
    (120L until 180L).map(i => (i, i % 3, i)).toDF("id", "p", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runPipeline()
    val gold2 = s.read.parquet(s"$root/gold/data")
    assert(gold2.count() === 90)
    assert(gold2.filter(col("p").isNull).count() === 0)
    assert(gold2.select("id").distinct().count() === 90)
    // silver prunes on the partition column like any partitioned table
    val (kept, files) = DataSkipping.prunedFiles(s, silver, col("p") === 2L)
    assert(kept.nonEmpty && kept.forall(_.contains("p=2")), kept.mkString("\n"))
    assert(kept.size < files.size)
  }

  test("offsets stay bounded and capped admission never silently drops an observed marker") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_adm") + "/t"
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    (0 until 3).foreach { k =>
      assert(DataSkipping.appendWithStats(
        (k * 10L until (k + 1) * 10L).map(i => (i, i)).toDF("id", "v")
          .coalesce(1),
        table, Seq("id"), commitName = Some(s"adm-$k")))
    }
    val src = new StatsTableSource(s.sqlContext, table, maxCommitsPerTrigger = 2)
    val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles(2)

    // BOUNDED OFFSETS: a delivered name that no longer exists in the
    // manifest ("ghost", expired by compaction) is pruned from the
    // next offset instead of riding every future offset forever
    val off1 = StatsCommitOffset.from(
      src.latestOffset(StatsCommitOffset(Seq("adm-0", "ghost")), limit))
    assert(!off1.commits.contains("ghost"), "expired delivered names must prune")
    assert(off1.commits.toSet === Set("adm-0", "adm-1", "adm-2"),
      s"live names admitted, got ${off1.commits}")

    // LOSS WINDOW: a marker OBSERVED by admission control but expired
    // before its batch was admitted must still enter the offset so
    // getBatch fails loudly — never a silent disappearance
    val fs = new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)
    val dir = DataSkipping.manifestDir(s, table)
    val observed = src.latestOffset(StatsCommitOffset(Seq("adm-0")), limit)
    assert(StatsCommitOffset.from(observed).commits.toSet
      === Set("adm-0", "adm-1", "adm-2"))
    assert(fs.delete(new Path(s"$dir/adm-2.parquet"), false)) // "expired"
    val off2 = StatsCommitOffset.from(
      src.latestOffset(StatsCommitOffset(Seq("adm-0", "adm-1")), limit))
    assert(off2.commits.contains("adm-2"),
      "an observed-but-unadmitted expired marker must still be admitted")
    val e = intercept[IllegalArgumentException](
      src.getBatch(Some(StatsCommitOffset(Seq("adm-0", "adm-1"))), off2))
    assert(e.getMessage.contains("no longer exists"),
      "the expired observed marker must fail loudly at getBatch")
  }

  test("a commit backlog drains in bounded batches (maxCommitsPerTrigger) with exactly-once delivery") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_backlog") + "/t"
    val outDir = tmpDir("stsrc_backlog_out") + "/o"
    val ckpt = tmpDir("stsrc_backlog_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    // establish the consumer first (the initial-snapshot batch is
    // deliberately uncapped — snapshot semantics need one consistent
    // batch), then build the backlog it must catch up on
    def drainCapped(): Int = {
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = s.readStream
        .format(classOf[StatsTableSourceProvider].getName)
        .option("path", table)
        .option("maxCommitsPerTrigger", "5")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.incrementAndGet()
          b.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
      batches.get()
    }
    drainCapped() // fresh consumer, empty table: offset established
    (0 until 20).foreach { k =>
      assert(DataSkipping.appendWithStats(
        (k * 10L until (k + 1) * 10L).map(i => (i, i * 2)).toDF("id", "v")
          .coalesce(1),
        table, Seq("id"), commitName = Some(f"backlog-$k%03d")))
    }
    // 20 owed commits / 5 per trigger = 4 bounded batches
    assert(drainCapped() === 4,
      "a 20-commit backlog at maxCommitsPerTrigger=5 must drain in 4 batches")
    val ids = s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 200L).toSeq,
      "capped batches must deliver every commit exactly once")
  }

  test("partitioned tables stream with partition values served from directory names, never NULL") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_part") + "/t"
    val outDir = tmpDir("stsrc_part_out") + "/o"
    val ckpt = tmpDir("stsrc_part_ckpt")
    // native partitioned table: p lives ONLY in `p=<k>` directory
    // names — a partition-blind source would serve p as NULL on
    // every row, silently
    DataSkipping.writeWithStats(
      (0L until 60L).map(i => (i, i % 3, i * 2)).toDF("id", "p", "v")
        .repartition(2),
      table, Seq("id"), bloomCols = Nil, partitionBy = Seq("p"))

    // fresh consumer: the snapshot batch must carry partition values
    drain(s, table, outDir, ckpt)
    val out1 = s.read.parquet(outDir)
    assert(out1.count() === 60)
    assert(out1.filter(col("p").isNull).count() === 0,
      "partition column must never stream as NULL")
    assert(out1.filter(col("p") === 1L).count() === 20)
    assert(out1.filter(col("id") === 7L).head.getAs[Long]("p") === 1L)
    assert(out1.schema("p").dataType ===
      org.apache.spark.sql.types.LongType,
      "partition column keeps the sidecar type, not bare discovery's")

    // incremental: a named commit through the partitioned append
    // path streams exactly its rows, partition values intact
    assert(DataSkipping.appendWithStats(
      (60L until 90L).map(i => (i, i % 3, i * 2)).toDF("id", "p", "v"),
      table, Seq("id"), commitName = Some("pcommit-b1")))
    drain(s, table, outDir, ckpt)
    val out2 = s.read.parquet(outDir)
    assert(out2.count() === 90)
    assert(out2.filter(col("p").isNull).count() === 0)
    (0L until 3L).foreach(k =>
      assert(out2.filter(col("p") === k).count() === 30,
        s"partition $k must hold its exact rows"))
    assert(out2.filter(col("id") === 75L).head.getAs[Long]("p") === 0L)

    // a replayed commit still short-circuits on the partitioned path
    assert(!DataSkipping.appendWithStats(
      (60L until 90L).map(i => (i, i % 3, i * 2)).toDF("id", "p", "v"),
      table, Seq("id"), commitName = Some("pcommit-b1")))
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).count() === 90,
      "replayed partitioned commit must not re-stream")
  }

  test("schema tracking: a mapped table streams under pinned logical names across renames and drops") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_map") + "/t"
    val outDir = tmpDir("stsrc_map_out") + "/o"
    val ckpt = tmpDir("stsrc_map_ckpt")
    val track = tmpDir("stsrc_map_track")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 50L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("map-b0")))
    DataSkipping.renameColumn(s, table, "v", "amount")
    // without a tracking location the mapped table is refused
    val e = intercept[Exception] { new StatsTableSource(s.sqlContext, table) }
    assert(e.getMessage.contains("schemaTrackingLocation"), e.getMessage)

    def drainTracked(): Unit = {
      val q = s.readStream
        .format(classOf[StatsTableSourceProvider].getName)
        .option("path", table)
        .option("schemaTrackingLocation", track)
        .load()
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // first start pins the CURRENT logical view (id, amount)
    drainTracked()
    val out1 = s.read.parquet(outDir)
    assert(out1.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(out1.count() == 50L)
    assert(out1.filter(col("id") === 7L).head.getLong(1) == 14L)
    // RENAME between runs (same tracking location): the consumer
    // keeps its pinned logical name; appends speak the NEW logical
    // name and still stream correctly (stable physical identity)
    DataSkipping.renameColumn(s, table, "amount", "amt")
    assert(DataSkipping.appendWithStats(
      (50L until 80L).map(i => (i, i * 2)).toDF("id", "amt").coalesce(1),
      table, Seq("id"), commitName = Some("map-b1")))
    drainTracked()
    val out2 = s.read.parquet(outDir)
    assert(out2.schema.fieldNames.toSeq == Seq("id", "amount"),
      "the pinned logical view must survive a rename")
    assert(out2.count() == 80L)
    assert(out2.filter(col("id") === 60L).head.getLong(1) == 120L)
    // logical DROP: metadata-only — the pinned column keeps serving
    // (old rows carry values; post-drop rows are genuinely null)
    DataSkipping.dropColumn(s, table, "amt")
    assert(DataSkipping.appendWithStats(
      (80L until 90L).map(i => Tuple1(i)).toDF("id").coalesce(1),
      table, Seq("id"), commitName = Some("map-b2"), mergeSchema = true))
    drainTracked()
    val out3 = s.read.parquet(outDir)
    assert(out3.count() == 90L)
    assert(out3.filter(col("id") === 85L).head.isNullAt(1),
      "post-drop rows read null under the pinned name")
    assert(out3.filter(col("id") === 60L and col("amount") === 120L).count() == 1L,
      "pre-drop rows keep their values under the pinned name")
  }

  test("a pending named commit superseded by an OVERWRITE delivers the folded zero-row batch — never the replaced rows") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_ow_tbl") + "/t"
    val outDir = tmpDir("stsrc_ow_out") + "/o"
    val ckpt = tmpDir("stsrc_ow_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 50L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("ow-b0")))
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).count() === 50)
    // a named commit lands but is NOT drained before an overwrite
    // replaces the table: the generation commit folds its marker to
    // zero rows (its data files left the table with the overwrite),
    // so the pending consumer gets the EMPTY batch — the replaced
    // rows are never served as if they were still table content, and
    // nothing fails silently-wrong. (The expired-marker analog: a
    // VANISHED marker fails loudly; a FOLDED one is a legal empty
    // commit.)
    assert(DataSkipping.appendWithStats(
      (50L until 90L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("ow-b1")))
    DataSkipping.writeWithStats(
      (1000L until 1010L).map(i => (i, -i)).toDF("id", "v").coalesce(1),
      table, Seq("id"))
    drain(s, table, outDir, ckpt)
    val ids = s.read.parquet(outDir).select("id").collect().map(_.getLong(0))
    assert(ids.length === 50 && ids.forall(_ < 50L),
      s"the superseded commit must deliver zero rows, got ${ids.length}")
    // the stream keeps working: a fresh post-overwrite commit streams
    assert(DataSkipping.appendWithStats(
      (2000L until 2020L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("ow-b2")))
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir)
      .filter(col("id") >= 2000L).count() === 20L)
    assert(s.read.parquet(outDir)
      .filter(col("id") >= 50L && col("id") < 90L).count() === 0L,
      "replaced rows must never surface downstream")
  }

  test("a FRESH consumer across an overwrite snapshots the NEW content only") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsrc_ow2_tbl") + "/t"
    val outDir = tmpDir("stsrc_ow2_out") + "/o"
    val ckpt = tmpDir("stsrc_ow2_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    assert(DataSkipping.appendWithStats(
      (0L until 60L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"), commitName = Some("ow2-b0")))
    DataSkipping.writeWithStats(
      (5000L until 5025L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, Seq("id"))
    drain(s, table, outDir, ckpt)
    val got = s.read.parquet(outDir).select("id").collect().map(_.getLong(0))
    assert(got.length === 25 && got.forall(_ >= 5000L),
      s"fresh snapshot must be exactly the overwrite content, got " +
        s"${got.length} rows")
  }
}
