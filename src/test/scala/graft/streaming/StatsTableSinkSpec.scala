package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class StatsTableSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  test("streamed batches land as named manifest commits; restart drains only new data; pruning works") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("stsink_src")
    val table = tmpDir("stsink_tbl") + "/t"
    val ckpt = tmpDir("stsink_ckpt")

    (0L until 500L).map(i => (i, i * 2)).toDF("id", "v")
      .coalesce(2).write.mode("append").parquet(srcDir)
    val q1 = StatsTableSink.run(
      FileIngest.stream(s, srcDir, schema, format = "parquet"),
      table, Seq("id"), ckpt)
    q1.awaitTermination()

    assert(DataSkipping.readSkipping(s, table, lit(true)).count() === 500)
    val manifests = new java.io.File(s"$table/${DataSkipping.StatsDir}")
      .listFiles().map(_.getName).filter(_.startsWith("commit-batch")).toSeq
    assert(manifests.nonEmpty, "batch must commit under its deterministic marker name")

    // restart with new source data: only the new files drain
    (500L until 800L).map(i => (i, i * 2)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = StatsTableSink.run(
      FileIngest.stream(s, srcDir, schema, format = "parquet"),
      table, Seq("id"), ckpt)
    q2.awaitTermination()

    val ids = DataSkipping.readSkipping(s, table, lit(true))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 800L).toSeq, "restart must not duplicate or drop")

    // the streamed table prunes like any stats table
    val (kept, all) = DataSkipping.prunedFiles(s, table, col("id") >= 600L)
    assert(kept.size < all.size, s"streamed manifest must prune: $kept of $all")
    assert(DataSkipping.readSkipping(s, table, col("id") >= 600L).count() === 200)
  }

  test("a replayed batch (same commit name) is skipped: exactly-once to manifest readers") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsink_replay") + "/t"
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))

    val batch = (0L until 100L).map(i => (i, i)).toDF("id", "v")
    assert(DataSkipping.appendWithStats(batch, table, Seq("id"),
      commitName = Some("commit-batch7")))
    // at-least-once delivery replays the SAME batch id
    assert(!DataSkipping.appendWithStats(batch, table, Seq("id"),
      commitName = Some("commit-batch7")), "replay must be skipped, not re-applied")
    assert(DataSkipping.readSkipping(s, table, lit(true)).count() === 100)
    // a genuinely new batch still commits
    assert(DataSkipping.appendWithStats(
      (100L until 150L).map(i => (i, i)).toDF("id", "v"), table, Seq("id"),
      commitName = Some("commit-batch8")))
    assert(DataSkipping.readSkipping(s, table, lit(true)).count() === 150)
  }

  test("crash between data move and marker: orphans invisible to manifest readers, replay repairs") {
    val s = spark
    import s.implicits._
    val table = tmpDir("stsink_crash") + "/t"
    StatsTableSink.ensureTable(s, table, schema, Seq("id"))
    val batch = (0L until 100L).map(i => (i, i)).toDF("id", "v")

    // fake the crash: data files land WITHOUT a manifest commit
    // (plain unnamed append writes rows + manifest; strip the
    // manifest rows back out to model dying pre-marker)
    batch.coalesce(1).write.mode("append").parquet(table)
    assert(s.read.parquet(table).count() === 100, "plain readers see the orphan")
    assert(DataSkipping.readSkipping(s, table, lit(true)).count() === 0,
      "manifest readers must not see uncommitted files")

    // the streaming replay re-writes the batch and commits
    assert(DataSkipping.appendWithStats(batch, table, Seq("id"),
      commitName = Some("commit-batch0")))
    assert(DataSkipping.readSkipping(s, table, lit(true)).count() === 100,
      "exactly the replayed batch, orphan still invisible")
    assert(s.read.parquet(table).count() === 200,
      "the orphan remains on disk for compactTable to reclaim")

    // compaction (stream stopped) folds the committed snapshot and
    // vacuums only its own replaced files; the manifest keeps exactly
    // the committed rows
    DataSkipping.compactTable(s, table, targetFileBytes = 1L << 30)
    assert(DataSkipping.readSkipping(s, table, lit(true)).count() === 100)
  }
}
