package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class ChangeFeedSourceSpec extends SparkSpec {

  private def drain(s: org.apache.spark.sql.SparkSession, table: String,
      outDir: String, ckpt: String,
      startingVersion: Option[Long] = None): Unit = {
    val reader = s.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", table)
    val q = startingVersion.fold(reader)(v =>
        reader.option("startingVersion", v.toString))
      .load()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def buildTable(s: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    import s.implicits._
    DataSkipping.writeWithStats(
      (0L until 400L).map(i => (i, s"p$i")).toDF("id", "payload")
        .repartitionByRange(4, col("id")),
      table, Seq("id"), bloomCols = Nil, changeFeed = true)
  }

  test("DML after stream start delivers typed micro-batches; restart delivers only the missed versions") {
    val s = spark
    val table = tmpDir("cdfsrc_tbl") + "/t"
    val outDir = tmpDir("cdfsrc_out") + "/o"
    val ckpt = tmpDir("cdfsrc_ckpt")
    buildTable(s, table)

    // fresh stream on a DML-free table: nothing owed, clean drain
    drain(s, table, outDir, ckpt)

    assert(DataSkipping.deleteWhere(s, table,
      col("id") >= 100L && col("id") < 150L) === 50L) // v1
    drain(s, table, outDir, ckpt)
    val wave1 = s.read.parquet(outDir)
    assert(wave1.count() === 50L)
    assert(wave1.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("delete" -> 50L))
    assert(wave1.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1L))

    // two more versions land while the stream is stopped; the
    // restarted stream owes exactly those — v1 must not re-deliver
    assert(DataSkipping.updateWhere(s, table,
      col("id") >= 200L && col("id") < 220L,
      Map("payload" -> lit("upd"))) === 20L) // v2
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 390L) === 10L) // v3
    drain(s, table, outDir, ckpt)
    val all = s.read.parquet(outDir)
    assert(all.count() === 50L + 40L + 10L)
    assert(all.groupBy("_commit_version", "_change_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap ===
      Map((1L, "delete") -> 50L,
        (2L, "update_preimage") -> 20L, (2L, "update_postimage") -> 20L,
        (3L, "delete") -> 10L))
  }

  test("startingVersion replays retained history; appends and compaction contribute no feed batches") {
    val s = spark
    import s.implicits._
    val table = tmpDir("cdfsrc_hist") + "/t"
    buildTable(s, table)
    assert(DataSkipping.deleteWhere(s, table, col("id") < 50L) === 50L) // v1
    assert(DataSkipping.updateWhere(s, table, col("id") >= 350L,
      Map("payload" -> lit("upd"))) === 50L) // v2

    // a consumer starting at 0 replays the whole retained feed
    val outDir = tmpDir("cdfsrc_hist_out") + "/o"
    val ckpt = tmpDir("cdfsrc_hist_ckpt")
    drain(s, table, outDir, ckpt, startingVersion = Some(0L))
    assert(s.read.parquet(outDir).groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("delete" -> 50L,
        "update_preimage" -> 50L, "update_postimage" -> 50L))

    // an append (in-generation) and a compaction (v3, no logical
    // change) must stream NOTHING through the feed
    assert(DataSkipping.appendWithStats(
      (1000L until 1050L).map(i => (i, s"p$i")).toDF("id", "payload")
        .coalesce(1), table, Seq("id")))
    assert(DataSkipping.compactTable(s, table) === 1)
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).count() === 150L,
      "appends/compaction are not change-feed batches")

    // ...but DML on the compacted table streams again
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 1000L) === 50L) // v4
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).filter(col("_commit_version") === 4L)
      .count() === 50L)
  }

  test("a crashed generation build's slot is reclaimed, not wedged on — the feed stays dense") {
    val s = spark
    val table = tmpDir("cdfsrc_gap") + "/t"
    val outDir = tmpDir("cdfsrc_gap_out") + "/o"
    val ckpt = tmpDir("cdfsrc_gap_ckpt")
    buildTable(s, table)
    drain(s, table, outDir, ckpt) // pinned at version 0

    assert(DataSkipping.deleteWhere(s, table, col("id") < 30L) === 30L) // v1
    // a crashed generation build occupies slot v2 with an uncommitted
    // dir. Contract (commitBuildAs occupant reclaim): the next writer
    // waits out the occupant grace window, reclaims the slot as crash
    // debris, and commits INTO it — committed versions stay dense, so
    // strict version targeting and the change feed never see a hole.
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$table/${DataSkipping.StatsDir}/v2"))
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 390L) === 10L) // v2: reclaimed
    assert(DataSkipping.tableVersions(s, table) === Seq(0L, 1L, 2L))

    // the stream delivers v1 and v2; nothing is skipped, nothing wedges
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(s.read.parquet(outDir).count() === 40L)
  }

  test("an owed version deleted out-of-band (mid-range hole) fails loudly instead of delivering silence") {
    val s = spark
    val table = tmpDir("cdfsrc_hole") + "/t"
    val outDir = tmpDir("cdfsrc_hole_out") + "/o"
    val ckpt = tmpDir("cdfsrc_hole_ckpt")
    buildTable(s, table)
    drain(s, table, outDir, ckpt) // pinned at version 0

    assert(DataSkipping.deleteWhere(s, table, col("id") < 30L) === 30L)  // v1
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 390L) === 10L) // v2
    // committed versions are dense by contract; rip v1 out from under
    // the consumer (manual cleanup / object-store loss). Skipping it
    // silently would lose its 30 delete rows — the stream must refuse.
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$table/${DataSkipping.StatsDir}/v1"), true))
    assert(DataSkipping.tableVersions(s, table) === Seq(0L, 2L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(s, table, outDir, ckpt)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("missing from")),
      s"expected the mid-range-hole refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("failOnDataLoss=false streams past a burned mid-range slot, delivering the retained versions") {
    val s = spark
    val table = tmpDir("cdfsrc_optout") + "/t"
    val outDir = tmpDir("cdfsrc_optout_out") + "/o"
    val ckpt = tmpDir("cdfsrc_optout_ckpt")
    buildTable(s, table)
    drain(s, table, outDir, ckpt) // pinned at version 0

    assert(DataSkipping.deleteWhere(s, table, col("id") < 30L) === 30L)  // v1
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 390L) === 10L) // v2
    // rip v1 out from under the consumer (the permanent-wedge shape:
    // a hole no future writer will ever reclaim)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$table/${DataSkipping.StatsDir}/v1"), true))
    assert(DataSkipping.tableVersions(s, table) === Seq(0L, 2L))

    // default contract unchanged: the same drain without the opt-out
    // still refuses (covered by the mid-range-hole test above); with
    // the opt-out the stream delivers v2 and ADVANCES past the hole
    val q = s.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", table)
      .option("failOnDataLoss", "false")
      .load()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = s.read.parquet(outDir)
    assert(out.count() === 10L)
    assert(out.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(2L))

    // the offset committed past the hole: a later DML is the only
    // thing the next drain owes — no permanent wedge, no re-delivery
    assert(DataSkipping.deleteWhere(s, table,
      col("id") >= 100L && col("id") < 105L) === 5L) // v3
    val q2 = s.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", table)
      .option("failOnDataLoss", "false")
      .load()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val all = s.read.parquet(outDir)
    assert(all.count() === 15L)
    assert(all.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("failOnDataLoss=false streams past a vacuum-expired window from the earliest retained version") {
    val s = spark
    val table = tmpDir("cdfsrc_vacopt") + "/t"
    val outDir = tmpDir("cdfsrc_vacopt_out") + "/o"
    val ckpt = tmpDir("cdfsrc_vacopt_ckpt")
    buildTable(s, table)
    drain(s, table, outDir, ckpt) // pinned at version 0

    assert(DataSkipping.deleteWhere(s, table, col("id") < 50L) === 50L) // v1
    // retention-0 DML vacuums v1 before the lagging consumer saw it
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 390L,
      retentionMs = 0L) === 10L) // v2
    assert(DataSkipping.tableVersions(s, table) === Seq(2L))
    val q = s.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", table)
      .option("failOnDataLoss", "false")
      .load()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = s.read.parquet(outDir)
    assert(out.count() === 10L, "v1 is lost (warned), v2 delivered")
    assert(out.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("a vacuumed version still owed to the consumer fails loudly instead of delivering silence") {
    val s = spark
    val table = tmpDir("cdfsrc_vac") + "/t"
    val outDir = tmpDir("cdfsrc_vac_out") + "/o"
    val ckpt = tmpDir("cdfsrc_vac_ckpt")
    buildTable(s, table)
    drain(s, table, outDir, ckpt) // pinned at version 0

    assert(DataSkipping.deleteWhere(s, table, col("id") < 50L) === 50L) // v1
    // retention-0 DML vacuums v1's generation (and its change rows)
    // before the lagging consumer ever saw it
    assert(DataSkipping.deleteWhere(s, table, col("id") >= 390L,
      retentionMs = 0L) === 10L) // v2
    assert(DataSkipping.tableVersions(s, table) === Seq(2L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(s, table, outDir, ckpt))
    assert(e.getMessage.contains("no longer retained") ||
      Option(e.getCause).exists(_.getMessage.contains("no longer retained")))
  }

  test("a deep history drains in bounded batches (maxVersionsPerTrigger) with exactly-once delivery") {
    val s = spark
    import s.implicits._
    val table = tmpDir("cdfsrc_deep") + "/t"
    val outDir = tmpDir("cdfsrc_deep_out") + "/o"
    val ckpt = tmpDir("cdfsrc_deep_ckpt")
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (i, s"p$i")).toDF("id", "payload")
        .coalesce(2),
      table, Seq("id"), bloomCols = Nil, changeFeed = true)
    // 50 DML versions, two deleted rows each
    (0L until 50L).foreach { k =>
      assert(DataSkipping.deleteWhere(s, table,
        col("id") === 2 * k || col("id") === 2 * k + 1,
        vacuum = false) === 2L)
    }
    assert(DataSkipping.tableVersions(s, table).size === 51)

    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = s.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("path", table)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "8")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet()
        rows.addAndGet(b.count())
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    // ceil(50 / 8) = 7 bounded batches — the O(versions) union plan a
    // single batch would build is capped at 8 frames
    assert(batches.get() === 7, s"expected 7 bounded batches, got ${batches.get()}")
    assert(rows.get() === 100L)
    val delivered = s.read.parquet(outDir)
    assert(delivered.count() === 100L, "every change row exactly once")
    assert(delivered.select("_commit_version").distinct().count() === 50L)
    assert(delivered.select("id").distinct().count() === 100L)
  }

  test("a single-relation batch spans schema evolution: pre-evolution change rows carry nulls") {
    val s = spark
    import s.implicits._
    val table = tmpDir("cdfsrc_evo") + "/t"
    val outDir = tmpDir("cdfsrc_evo_out") + "/o"
    val ckpt = tmpDir("cdfsrc_evo_ckpt")
    buildTable(s, table)
    assert(DataSkipping.deleteWhere(s, table, col("id") < 40L) === 40L) // v1, old schema
    assert(DataSkipping.appendWithStats(
      (1000L until 1100L).map(i => (i, s"p$i", i * 2))
        .toDF("id", "payload", "score"),
      table, Seq("id", "score"), mergeSchema = true))
    assert(DataSkipping.deleteWhere(s, table,
      col("id") >= 1000L && col("id") < 1010L) === 10L) // v2, widened schema

    // one drain covers BOTH versions in one batch (one relation):
    // v1's narrower change files must surface null score, v2's real
    // values — and each row must carry its own version from its path
    drain(s, table, outDir, ckpt, startingVersion = Some(0L))
    val out = s.read.parquet(outDir)
    assert(out.columns.contains("score"))
    assert(out.count() === 50L)
    assert(out.filter(col("_commit_version") === 1L).count() === 40L)
    assert(out.filter(col("_commit_version") === 1L && col("score").isNull)
      .count() === 40L)
    assert(out.filter(col("_commit_version") === 2L &&
      col("score") === col("id") * 2).count() === 10L)
  }

  test("deletion-vector DML streams through the feed identically to copy-on-write") {
    val s = spark
    import s.implicits._
    val table = tmpDir("cdfsrc_dv") + "/t"
    val outDir = tmpDir("cdfsrc_dvout") + "/o"
    val ckpt = tmpDir("cdfsrc_dvckpt")
    buildTable(s, table)
    drain(s, table, outDir, ckpt) // pin the stream at v0

    assert(DataSkipping.deleteWhereDV(s, table,
      col("id") >= 50L && col("id") < 90L) === 40L)            // v1
    assert(DataSkipping.updateWhereDV(s, table, col("id") === 200L,
      Map("payload" -> lit("dvup"))) === 1L)                   // v2
    drain(s, table, outDir, ckpt)
    val got = s.read.parquet(outDir)
    assert(got.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("delete" -> 40L, "update_preimage" -> 1L,
        "update_postimage" -> 1L))
    assert(got.filter(col("_change_type") === "update_postimage")
      .select("payload").head().getString(0) === "dvup")
    // restart owes nothing — vector DML versions commit offsets like
    // any other
    drain(s, table, outDir, ckpt)
    assert(s.read.parquet(outDir).count() === 42L)
  }

  test("a feed-less table is refused at stream construction") {
    val s = spark
    import s.implicits._
    val table = tmpDir("cdfsrc_off") + "/t"
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (i, s"p$i")).toDF("id", "payload"),
      table, Seq("id"))
    val e = intercept[Exception](
      drain(s, table, tmpDir("cdfsrc_off_out") + "/o", tmpDir("cdfsrc_off_ckpt")))
    assert(e.getMessage.contains("no change data feed") ||
      Option(e.getCause).exists(_.getMessage.contains("no change data feed")))
  }
}
