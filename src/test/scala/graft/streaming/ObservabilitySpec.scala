package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming backlog observability ([[TableLag]] /
  * [[StreamingPipeline.pipelineStatus]]): commits/versions behind,
  * computed from the table manifest + the consumer checkpoint only.
  */
class ObservabilitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  test("stats-table consumer lag across a throttled drain: full backlog, partial, zero, new arrival") {
    val s = spark
    import s.implicits._
    val table = tmpDir("lag_tbl") + "/t"
    val ckpt = tmpDir("lag_ckpt")
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    def append(name: String, base: Long): Unit =
      assert(DataSkipping.appendWithStats(
        (base until base + 100L).map(i => (i, i)).toDF("id", "v").coalesce(1),
        table, Seq("id"), commitName = Some(name)))
    def fullDrain(): Unit = {
      val q = s.readStream
        .format(classOf[StatsTableSourceProvider].getName)
        .option("path", table).load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    append("commit-w-b0", 0L)

    // never-started consumer: the whole backlog is pending
    val l0 = TableLag.statsTableLag(s, table, ckpt)
    assert(l0.behind === 1L && l0.committed === 0L && l0.available === 1L)
    fullDrain()
    assert(TableLag.statsTableLag(s, table, ckpt).behind === 0L)

    // 3 new commits → backlog 3 (the initial snapshot is behind us,
    // so per-trigger admission caps now apply)
    (1 to 3).foreach(b => append(s"commit-w-b$b", b * 100L))
    val l1 = TableLag.statsTableLag(s, table, ckpt)
    assert(l1.behind === 3L && l1.committed === 1L && l1.available === 4L)

    // PARTIAL drain: one commit per micro-batch, the sink dies on the
    // second batch of this run — exactly one more commit is durably
    // consumed, the rest is still backlog
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = s.readStream
      .format(classOf[StatsTableSourceProvider].getName)
      .option("path", table).option("maxCommitsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        if (seen.incrementAndGet() >= 2) sys.error("die on second batch")
      }
      .option("checkpointLocation", ckpt)
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    val l2 = TableLag.statsTableLag(s, table, ckpt)
    assert(l2.behind === 2L && l2.committed === 2L,
      s"after a one-commit batch: $l2")
    assert(l2.pending.forall(l1.pending.contains))

    // full drain → zero backlog
    fullDrain()
    val l3 = TableLag.statsTableLag(s, table, ckpt)
    assert(l3.behind === 0L && l3.pending.isEmpty && l3.committed === 4L)

    // a new commit shows up as exactly one pending entry
    append("commit-w-b9", 900L)
    val l4 = TableLag.statsTableLag(s, table, ckpt)
    assert(l4.behind === 1L && l4.pending === Seq("commit-w-b9"))
  }

  test("change-feed consumer lag in versions") {
    val s = spark
    import s.implicits._
    val table = tmpDir("lagcdf_tbl") + "/t"
    val ckpt = tmpDir("lagcdf_ckpt")
    DataSkipping.writeWithStats(
      (0L until 200L).map(i => (i, i % 5)).toDF("id", "k")
        .repartitionByRange(2, col("id")), table, Seq("id"),
      bloomCols = Nil, changeFeed = true)
    DataSkipping.deleteWhere(s, table, col("id") < 20L, vacuum = false)  // v1
    DataSkipping.deleteWhere(s, table, col("id") >= 180L, vacuum = false) // v2

    // fresh checkpoint: nothing durably consumed
    val f = TableLag.changeFeedLag(s, table, ckpt)
    assert(f.latestVersion === 2L && f.committedVersion === -1L && f.behind === 3L)

    val q = s.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .option("path", table).load()
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val l = TableLag.changeFeedLag(s, table, ckpt)
    assert(l.behind === 0L && l.committedVersion === 2L)

    DataSkipping.deleteWhere(s, table,
      col("id") >= 100L && col("id") < 120L, vacuum = false) // v3
    val l2 = TableLag.changeFeedLag(s, table, ckpt)
    assert(l2.behind === 1L && l2.latestVersion === 3L)
  }

  test("pipelineStatus reports per-edge backlog and drains to zero on the next runOnce") {
    val s = spark
    import s.implicits._
    val dropDir = tmpDir("lag_drop")
    val root = tmpDir("lag_root")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dropDir, "b1.csv"), "id,v\n1,10\n2,20\n")

    val p = new StreamingPipeline(s, root)
    p.source("bronze")(FileIngest.stream(s, dropDir, schema,
      format = "csv", options = Map("header" -> "true")))
    p.statsTable("silver", Seq("id"), "bronze") { d => d("bronze") }
    p.statsTable("gold", Seq("id"), "silver") { d =>
      d("silver").withColumn("v", col("v") * 2) }
    p.runOnce()
    assert(p.pipelineStatus().forall(_.behind === 0L),
      p.pipelineStatus().mkString("\n"))

    // a commit lands in silver that gold has not seen (an out-of-band
    // writer — the exact situation backlog monitoring exists for)
    assert(DataSkipping.appendWithStats(
      Seq((50L, 500L)).toDF("id", "v"),
      p.dataDir("silver"), Seq("id"), commitName = Some("oob-1")))
    val lag = p.tableLag("gold")
    assert(lag.size === 1 && lag.head.behind === 1L &&
      lag.head.pending === Seq("oob-1"), lag.toString)
    // the pipeline-wide view sees the same edge behind
    assert(p.pipelineStatus().map(_.behind).sum === 1L)

    p.runOnce()
    assert(p.pipelineStatus().forall(_.behind === 0L))
    assert(p.readTable("gold").filter(col("id") === 50L)
      .select("v").head.getLong(0) === 1000L)

    // MIXED dep list: a consumer reading a PLAIN source (bronze, a
    // file stream) AND a stats table — the lag must pair the stats
    // dep with its offset by position among ALL deps, not among the
    // stats deps alone
    p.statsTable("mixed", Seq("id"), "bronze", "silver") { d =>
      d("bronze").unionByName(d("silver"))
    }
    p.runOnce()
    val mixedLag = p.tableLag("mixed")
    assert(mixedLag.size === 1 && mixedLag.head.behind === 0L,
      mixedLag.toString)
    assert(DataSkipping.appendWithStats(
      Seq((60L, 600L)).toDF("id", "v"),
      p.dataDir("silver"), Seq("id"), commitName = Some("oob-2")))
    assert(p.tableLag("mixed").head.behind === 1L)
  }

  test("changeFeedLag on a table with no committed generations reports clean zero lag") {
    val s = spark
    // a monitoring poll hitting a not-yet-materialized table path
    // must report clean zero, not crash the whole poll loop
    val table = tmpDir("lag_empty") + "/t"
    new java.io.File(table).mkdirs()
    val l = TableLag.changeFeedLag(s, table, tmpDir("lag_empty_ck"))
    assert(l.latestVersion === -1L && l.behind === 0L)
  }
}
