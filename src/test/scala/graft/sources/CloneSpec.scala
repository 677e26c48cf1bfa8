package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone ([[DataSkipping.cloneTable]]): zero-copy creation,
  * independent lifecycle, source never written.
  */
class CloneSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cln").toString

  private def dataFiles(dir: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) Set.empty
    else fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
  }

  test("clone reads the source's files with zero data copied; lifecycles are independent") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"
    val cln = s"$root/cln"
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, s"p$i")).toDF("id", "payload")
        .repartitionByRange(8, col("id")),
      src, Seq("id"))
    val srcFiles = dataFiles(src)
    val referenced = DataSkipping.cloneTable(s, src, cln)
    assert(referenced === 8L)
    assert(dataFiles(cln).isEmpty, "shallow clone copies no data files")

    // identical reads, pruning included
    val pred = col("id") >= 1000L && col("id") < 1500L
    assert(DataSkipping.readSkipping(s, cln, pred).count() === 500L)
    val (kept, all) = DataSkipping.prunedFiles(s, cln, pred)
    assert(all.size === 8 && kept.size <= 2, "clone must prune like the source")

    // DML on the CLONE: touched file rewritten INTO the clone root,
    // source bytes and manifest untouched
    assert(DataSkipping.deleteWhere(s, cln,
      col("id") >= 100L && col("id") < 200L) === 100L)
    assert(dataFiles(src) === srcFiles, "source files must never change")
    assert(DataSkipping.readSkipping(s, src, lit(true)).count() === 4000L)
    assert(DataSkipping.readSkipping(s, cln, lit(true)).count() === 3900L)
    assert(dataFiles(cln).nonEmpty, "the rewrite lands in the clone root")

    // DML on the SOURCE: the clone is pinned at its creation state
    DataSkipping.deleteWhere(s, src, col("id") >= 3000L, vacuum = false)
    assert(DataSkipping.readSkipping(s, cln, lit(true)).count() === 3900L)

    // the clone's retention-0 vacuum reclaims only clone-local
    // replaced files — every ORIGINAL source file survives (the
    // source's own delete above legitimately added a rewritten part)
    DataSkipping.vacuumTable(s, cln, retentionMs = 0L)
    assert(srcFiles.subsetOf(dataFiles(src)),
      "clone vacuum must never reclaim source files")
    assert(DataSkipping.readSkipping(s, cln, lit(true)).count() === 3900L)
  }

  test("clone carries vectors and constraints; compaction makes it self-contained") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"
    val cln = s"$root/cln"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      src, Seq("id"))
    DataSkipping.addCheckConstraint(s, src, "v_even", "v % 2 = 0")
    DataSkipping.deleteWhereDV(s, src, col("id") < 50L)
    DataSkipping.cloneTable(s, src, cln)

    // the source's deletion vector is part of the cloned state
    assert(DataSkipping.readSkipping(s, cln, lit(true)).count() === 950L)
    // constraints enforce on the clone
    assert(DataSkipping.tableConstraints(s, cln) === Map("v_even" -> "v % 2 = 0"))
    intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(
        Seq((2000L, 3L)).toDF("id", "v"), cln, Seq("id"))
    }

    // compaction re-homes every byte: fully self-contained clone
    DataSkipping.compactTable(s, cln, targetFileBytes = 1L << 30,
      vacuum = false)
    val fs = new org.apache.hadoop.fs.Path(cln).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    val claimed = DataSkipping.readManifest(s, cln)
      .select("file").collect().map(_.getString(0))
    assert(claimed.forall(_.contains("/cln/")),
      s"post-compact manifest must only reference clone-local files: " +
        claimed.mkString(","))
    assert(DataSkipping.readSkipping(s, cln, lit(true)).count() === 950L)

    // restore the clone back to v0 (source-referencing manifest):
    // the presence check must find the out-of-root files
    DataSkipping.restoreTable(s, cln, 0L, vacuum = false)
    assert(DataSkipping.readSkipping(s, cln, lit(true)).count() === 950L)
  }

  test("cloning onto an existing stats table is refused") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"
    DataSkipping.writeWithStats(
      (0L until 10L).map(i => (i, i)).toDF("id", "v"), src, Seq("id"))
    intercept[IllegalArgumentException] {
      DataSkipping.cloneTable(s, src, src)
    }
  }
}
