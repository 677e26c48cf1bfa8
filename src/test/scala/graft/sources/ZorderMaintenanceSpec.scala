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
}
