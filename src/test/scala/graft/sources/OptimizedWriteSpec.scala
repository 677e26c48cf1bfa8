package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Optimized partitioned writes (`optimizeWrite = true` on
  * writeWithStats/appendWithStats): rows shuffle onto their partition
  * values before the write job, so each partition directory gains ONE
  * file per write instead of one per (task × value) — the small-file
  * fan-out an ingest-cadence 100 TB table cannot afford to create and
  * then compact away. Correctness must be untouched: identical rows,
  * identical pruning behavior.
  */
class OptimizedWriteSpec extends SparkSpec {

  private def input(n: Long, tasks: Int) =
    spark.range(0, n).repartition(tasks).select(col("id"),
      (col("id") * 7 % 100).as("v"), pmod(col("id"), lit(8)).as("p"))

  private def fileCount(t: String): Long =
    DataSkipping.readManifest(spark, t).select("file").distinct().count()

  test("fresh partitioned write: one file per partition value, same rows") {
    val root = tmpDir("graft_ow1")
    val df = input(4000, 16) // 16 tasks, each holding all 8 p values
    DataSkipping.writeWithStats(df, s"$root/control", Seq("id", "v"),
      bloomCols = Nil, partitionBy = Seq("p"))
    DataSkipping.writeWithStats(df, s"$root/opt", Seq("id", "v"),
      bloomCols = Nil, partitionBy = Seq("p"), optimizeWrite = true)
    val control = fileCount(s"$root/control")
    val opt = fileCount(s"$root/opt")
    assert(opt == 8L, s"optimized write must leave 1 file/dir, got $opt")
    assert(control > opt,
      s"control should fan out past 8 files, got $control")
    // byte-for-byte row equality and intact partition pruning
    assert(DataSkipping.readSkipping(spark, s"$root/opt",
        col("id").isNotNull).collect().toSet ==
      df.collect().toSet)
    val pruned = DataSkipping.readSkipping(spark, s"$root/opt",
      col("p") === 3L)
    assert(pruned.count() == 500L)
  }

  test("appends route too: +1 file per touched directory per append") {
    val root = tmpDir("graft_ow2")
    val t = s"$root/t"
    DataSkipping.writeWithStats(input(4000, 16), t, Seq("id", "v"),
      bloomCols = Nil, partitionBy = Seq("p"), optimizeWrite = true)
    val before = fileCount(t)
    DataSkipping.appendWithStats(
      input(4000, 16).filter(col("id") >= 3000L)
        .withColumn("id", col("id") + 10000L),
      t, Seq("id", "v"), optimizeWrite = true)
    assert(fileCount(t) == before + 8L,
      "an all-values append must add exactly one file per directory")
    // the un-optimized append on the same table still fans out
    DataSkipping.appendWithStats(
      input(4000, 16).filter(col("id") >= 3000L)
        .withColumn("id", col("id") + 20000L),
      t, Seq("id", "v"))
    assert(fileCount(t) > before + 16L)
    assert(DataSkipping.readSkipping(spark, t, col("id").isNotNull)
      .count() == 4000L + 1000L + 1000L)
  }

  test("flat tables ignore the knob") {
    val root = tmpDir("graft_ow3")
    val df = input(1000, 4).drop("p")
    DataSkipping.writeWithStats(df, s"$root/t", Seq("id"),
      bloomCols = Nil, optimizeWrite = true)
    assert(DataSkipping.readSkipping(spark, s"$root/t",
      col("id").isNotNull).count() == 1000L)
  }
}
