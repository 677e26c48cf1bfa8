package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `OPTIMIZE ZORDER` as maintenance ([[DataSkipping.zorderTable]]):
  * re-clustering an existing table with compaction's safety contract.
  */
class ZorderMaintenanceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_zm").toString

  test("re-clustering makes the second column prunable; rows identical; vector materialized") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // written sorted by x only: y spans every file's range, so y
    // predicates prune nothing
    val n = 1 << 14
    val df = (0L until n).map { i => (i, (i * 2654435761L) % n) }
      .toDF("x", "y")
    DataSkipping.writeWithStats(
      df.repartitionByRange(16, col("x")), dir, Seq("x", "y"))
    val yPred = col("y") >= 0L && col("y") < (n / 16)
    val (keptBefore, allBefore) = DataSkipping.prunedFiles(s, dir, yPred)
    assert(allBefore.size === 16 && keptBefore.size >= 12,
      s"precondition: y must be unprunable in the linear layout, kept ${keptBefore.size}")
    val expected = DataSkipping.readSkipping(s, dir, yPred)
      .select("x").collect().map(_.getLong(0)).sorted

    // DV-delete a band, then re-cluster: the op must materialize the
    // vector and carry the flags
    DataSkipping.deleteWhereDV(s, dir, col("x") < 100L)
    val written = DataSkipping.zorderTable(s, dir, Seq("x", "y"),
      targetFiles = 16, vacuum = false)
    assert(written === 16)

    // rows identical to the pre-zorder visible state
    val got = DataSkipping.readSkipping(s, dir, yPred)
      .select("x").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === expected.filter(_ >= 100L).toSeq)
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === n - 100L)
    assert(!new org.apache.hadoop.fs.Path(
        DataSkipping.manifestDir(s, dir), DataSkipping.DvDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(
        DataSkipping.manifestDir(s, dir), DataSkipping.DvDir)),
      "z-order must materialize the vector")

    // BOTH columns now prune
    val (keptY, allY) = DataSkipping.prunedFiles(s, dir, yPred)
    assert(allY.size === 16)
    assert(keptY.size <= 8, s"y must prune after z-order, kept ${keptY.size}")
    val (keptX, _) = DataSkipping.prunedFiles(s, dir,
      col("x") >= 0L && col("x") < (n / 16))
    assert(keptX.size <= 8, s"x must still prune, kept ${keptX.size}")

    // history records the op; the pre-zorder generation still time
    // travels (with ITS vector applied)
    val hist = DataSkipping.describeHistory(s, dir)
      .select("operation").collect().map(_.getString(0))
    assert(hist.contains("OPTIMIZE ZORDER"))
    assert(DataSkipping.readSkippingAt(s, dir, 1L, lit(true)).count() === n - 100L)
    assert(DataSkipping.readSkippingAt(s, dir, 0L, lit(true)).count() === n.toLong)
  }

  test("untracked z column and degenerate inputs are refused loudly") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (i, i, s"p$i")).toDF("x", "y", "payload")
        .repartitionByRange(2, col("x")), dir, Seq("x"))
    intercept[IllegalArgumentException] {
      DataSkipping.zorderTable(s, dir, Seq("x", "y"), targetFiles = 2)
    }
    intercept[IllegalArgumentException] {
      DataSkipping.zorderTable(s, dir, Seq("x"), targetFiles = 2)
    }
  }

  test("hilbert index: bijective unit-step walk on the top-level subgrid; beats morton's worst jumps") {
    val s = spark
    import s.implicits._
    graft.plans.GraftFunctions.register(s)
    // the 16x16 top-level subgrid of the order-16 curve: cells
    // (i<<12, j<<12). Their indices / 4096^2 must be a PERMUTATION
    // of 0..255 whose consecutive cells are grid-ADJACENT — the
    // property Morton lacks (its quadrant seams jump diagonally).
    val grid = (for (i <- 0 until 16; j <- 0 until 16)
      yield (i.toLong << 12, j.toLong << 12)).toDF("x", "y")
    val cells = grid.select(col("x"), col("y"),
        (call_function("graft_hilbert", col("x"), col("y")) /
          lit(4096L * 4096L)).cast("bigint").as("d"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0) >> 12, r.getLong(1) >> 12)))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq === (0L until 256L), "bijection on the subgrid")
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"consecutive Hilbert cells must be adjacent: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert re-cluster: rows identical, both columns prune, history records the op") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val n = 1 << 14
    val df = (0L until n).map { i => (i, (i * 2654435761L) % n) }
      .toDF("x", "y")
    DataSkipping.writeWithStats(
      df.repartitionByRange(16, col("x")), dir, Seq("x", "y"))
    val yPred = col("y") >= 0L && col("y") < (n / 16)
    DataSkipping.zorderTable(s, dir, Seq("x", "y"),
      targetFiles = 16, curve = "hilbert")
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === n.toLong)
    val (keptY, allY) = DataSkipping.prunedFiles(s, dir, yPred)
    assert(allY.size === 16)
    assert(keptY.size <= 8, s"y must prune after hilbert, kept ${keptY.size}")
    val (keptX, _) = DataSkipping.prunedFiles(s, dir,
      col("x") >= 0L && col("x") < (n / 16))
    assert(keptX.size <= 8, s"x must still prune, kept ${keptX.size}")
    // 3+ columns refused for the 2-D curve; unknown curve refused
    intercept[IllegalArgumentException] {
      DataSkipping.zorderTable(s, dir, Seq("x", "y", "x"),
        targetFiles = 4, curve = "hilbert")
    }
    intercept[IllegalArgumentException] {
      DataSkipping.zorderTable(s, dir, Seq("x", "y"),
        targetFiles = 4, curve = "peano")
    }
  }

  test("incremental recluster: rewrite cost proportional to backlog, never table size") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // manifest-claimed live files only (vacuum=false keeps replaced
    // files on disk for time travel — they are not table state)
    def dataFiles(): Map[String, (Long, Long)] =
      DataSkipping.readManifest(s, dir).select("file").collect()
        .map { r =>
          val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(r.getString(0)))
          st.getPath.getName -> (st.getLen, st.getModificationTime)
        }.toMap
    val n = 1 << 14
    val df = (0L until n).map { i => (i, (i * 2654435761L) % n) }.toDF("x", "y")
    DataSkipping.writeWithStats(
      df.repartitionByRange(16, col("x")), dir, Seq("x", "y"))
    // no clustering spec yet: incremental refuses to bootstrap
    assert(intercept[IllegalArgumentException] {
      DataSkipping.optimizeIncremental(s, dir)
    }.getMessage.contains("clustering spec"))
    DataSkipping.zorderTable(s, dir, Seq("x", "y"), targetFiles = 16,
      vacuum = false)
    // steady state: zero backlog, zero rewrites
    assert(DataSkipping.optimizeIncremental(s, dir, vacuum = false) === 0)
    val clustered = dataFiles()
    assert(clustered.size === 16)
    // two small appends = the unclustered backlog
    (0 until 2).foreach { k =>
      DataSkipping.appendWithStats(
        (0L until (n / 64).toLong).map { i =>
          (n + k * 1000L + i, (i * 7L) % n) }.toDF("x", "y").coalesce(1),
        dir, Seq("x", "y"))
    }
    val withBacklog = dataFiles()
    assert(withBacklog.size === 18)
    val reclustered = DataSkipping.optimizeIncremental(s, dir,
      vacuum = false)
    assert(reclustered === 2, s"backlog was 2 files, reclustered $reclustered")
    // PROPORTIONALITY: every previously-clustered file survives
    // byte-identical (name+size+mtime) — the pass moved only backlog
    // bytes, a small fraction of the table
    val after = dataFiles()
    clustered.foreach { case (name, meta) =>
      assert(after.get(name).contains(meta),
        s"clustered file $name was rewritten by an incremental pass")
    }
    val backlogNames = withBacklog.keySet -- clustered.keySet
    assert((after.keySet & backlogNames).isEmpty,
      "backlog files must be replaced, not kept")
    // rows intact, y still prunes (new files share the key space)
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() ===
      n.toLong + 2L * (n / 64))
    val (keptY, allY) = DataSkipping.prunedFiles(s, dir,
      col("y") >= 0L && col("y") < (n / 16))
    assert(keptY.size < allY.size, s"y stopped pruning: $keptY / $allY")
    // idempotent steady state again
    assert(DataSkipping.optimizeIncremental(s, dir, vacuum = false) === 0)
    // a DML rewrite un-clusters exactly the touched files; the next
    // incremental pass picks up only those — the bound is DERIVED
    // from the files the DML actually produced, not a magic constant
    // (bin-packing boundaries make the raw count run-sensitive)
    val preDml = dataFiles()
    DataSkipping.deleteWhere(s, dir, col("x") >= 100L && col("x") < 110L,
      vacuum = false)
    val dmlNew = (dataFiles().keySet -- preDml.keySet).size
    assert(dmlNew >= 1 && dmlNew < preDml.size / 2,
      s"DML should touch a file band, not the table: $dmlNew of ${preDml.size}")
    val afterDml = DataSkipping.optimizeIncremental(s, dir, vacuum = false)
    assert(afterDml === dmlNew,
      s"incremental pass must recluster exactly the DML-touched files: " +
        s"$afterDml vs $dmlNew")
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() ===
      n.toLong + 2L * (n / 64) - 10L)
    // SQL surface + history
    val res = GraftSql.sql(s, s"OPTIMIZE '$dir' INCREMENTAL").head
    assert(res.getString(1) === "OPTIMIZE INCREMENTAL" && res.getLong(2) === 0L)
    val ops = DataSkipping.describeHistory(s, dir)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("OPTIMIZE INCREMENTAL"), ops.mkString(","))
  }
}
