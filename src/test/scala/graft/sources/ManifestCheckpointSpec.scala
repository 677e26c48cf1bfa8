package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** checkpointManifest: fold an ingest-cadence table's manifest parts
  * into one, data untouched, every storage contract intact.
  */
class ManifestCheckpointSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ckpt").toString

  private def manifestParts(s: org.apache.spark.sql.SparkSession,
      t: String): Seq[String] = {
    val fs = new Path(t).getFileSystem(s.sparkContext.hadoopConfiguration)
    val dir = new Path(DataSkipping.manifestDir(s, t))
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSeq
  }

  test("checkpoint folds commit parts to one, preserves content, skipping, markers and time travel") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 2000L).map(i => (i, i % 7)).toDF("id", "k")
        .repartitionByRange(4, col("id")), t, Seq("id"))
    // ingest cadence: 12 commits, half named
    (0 until 12).foreach { i =>
      val base = 10000L + i * 100L
      DataSkipping.appendWithStats(
        (base until base + 100L).map(j => (j, j % 7)).toDF("id", "k")
          .coalesce(1), t, Seq("id"),
        commitName = if (i % 2 == 0) Some(s"ing-$i") else None)
    }
    val partsBefore = manifestParts(s, t)
    assert(partsBefore.size >= 13, s"expected one part per commit, " +
      s"got ${partsBefore.size}")
    val before = DataSkipping.readSkipping(s, t, lit(true)).count()
    val vPre = DataSkipping.tableVersions(s, t).max

    val v = DataSkipping.checkpointManifest(s, t, vacuum = false)
    assert(v === vPre + 1)

    // one compact part plus the six named markers re-created zero-row
    val partsAfter = manifestParts(s, t)
    assert(partsAfter.count(_.startsWith("part-")) === 1,
      s"checkpoint must fold to ONE part, got $partsAfter")
    assert((0 until 12 by 2).forall(i => partsAfter.contains(s"ing-$i.parquet")),
      "named markers must survive the checkpoint")
    // content identical, stats skipping still prunes
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === before)
    assert(DataSkipping.readSkipping(s, t,
      col("id") >= 10000L && col("id") < 10100L).count() === 100L)
    // named replay still short-circuits (exactly-once across checkpoint)
    assert(!DataSkipping.appendWithStats(
      (10000L until 10100L).map(j => (j, j % 7)).toDF("id", "k").coalesce(1),
      t, Seq("id"), commitName = Some("ing-0")))
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === before)
    // time travel to the pre-checkpoint generation still reads whole
    assert(DataSkipping.readSkippingAt(s, t, vPre, lit(true)).count() === before)
    // history records the fold
    val ops = DataSkipping.describeHistory(s, t)
      .orderBy("version").select("operation").collect().map(_.getString(0))
    assert(ops.last === "CHECKPOINT", ops.mkString(","))
    // appends after the checkpoint land normally
    assert(DataSkipping.appendWithStats(
      (50000L until 50050L).map(j => (j, j % 7)).toDF("id", "k").coalesce(1),
      t, Seq("id")))
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === before + 50L)
  }

  test("checkpointEveryCommits keeps an ingest table's manifest bounded by the cadence, exactly-once intact") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, i)).toDF("id", "v").coalesce(2),
      t, Seq("id"))
    // 18 unnamed ingest commits + 2 named ones at a 6-part cadence:
    // the FOLDABLE part count never accumulates past the cadence
    // (named markers ride — they are replay state, bounded by
    // markerRetention, not by folds)
    (0 until 20).foreach { i =>
      val base = 10000L + i * 100L
      val name = if (i % 10 == 0) Some(s"cad-$i") else None
      assert(DataSkipping.appendWithStats(
        (base until base + 100L).map(j => (j, j)).toDF("id", "v").coalesce(1),
        t, Seq("id"), commitName = name,
        checkpointEveryCommits = Some(6)))
      val parts = manifestParts(s, t).count(_.startsWith("part-"))
      assert(parts <= 6, s"cadence must bound the part tail, got $parts after commit $i")
    }
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 2500L)
    // replay of an already-folded named commit is still a no-op
    assert(!DataSkipping.appendWithStats(
      (10000L until 10100L).map(j => (j, j)).toDF("id", "v").coalesce(1),
      t, Seq("id"), commitName = Some("cad-0"),
      checkpointEveryCommits = Some(6)))
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 2500L)
    val ops = DataSkipping.describeHistory(s, t)
      .select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "CHECKPOINT") >= 2, ops.mkString(","))
  }

  test("checkpoint carries the deletion vector and the change feed across the fold") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, 0L)).toDF("id", "v").coalesce(2),
      t, Seq("id"), bloomCols = Nil, changeFeed = true)
    assert(DataSkipping.deleteWhereDV(s, t, col("id") < 100L,
      vacuum = false) === 100L)
    (0 until 3).foreach { i =>
      DataSkipping.appendWithStats(
        (2000L + i * 10L until 2000L + i * 10L + 10L).map(j => (j, 1L))
          .toDF("id", "v").coalesce(1), t, Seq("id"))
    }
    val before = DataSkipping.readSkipping(s, t, lit(true)).count()
    assert(before === 930L)
    DataSkipping.checkpointManifest(s, t, vacuum = false)
    // DV rode the fold: dead rows stay invisible, purge still resolves
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 930L)
    assert(DataSkipping.readSkipping(s, t, col("id") < 100L).count() === 0L)
    // the change feed reads through checkpoint generations: the
    // delete's change rows are all still there
    val changes = DataSkipping.readChangeFeed(s, t, 0L)
    assert(changes.filter(col("_change_type") === "delete").count() === 100L)
    assert(DataSkipping.purgeDeletionVectors(s, t, vacuum = false) === 100L)
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 930L)
  }
}
