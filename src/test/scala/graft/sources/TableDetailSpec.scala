package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `TIMESTAMP AS OF` resolution ([[DataSkipping.versionAtTime]]) and
  * the `DESCRIBE DETAIL` analog ([[DataSkipping.tableDetail]]).
  */
class TableDetailSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_det").toString

  test("timestamp time travel resolves to the latest commit at-or-before the instant") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, s"p$i")).toDF("id", "payload")
        .repartitionByRange(2, col("id")), dir, Seq("id"))
    Thread.sleep(15)
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(15)
    DataSkipping.deleteWhere(s, dir, col("id") < 100L, vacuum = false) // v1
    Thread.sleep(15)
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(15)
    DataSkipping.deleteWhere(s, dir, col("id") >= 900L, vacuum = false) // v2

    assert(DataSkipping.versionAtTime(s, dir, afterV0) === 0L)
    assert(DataSkipping.versionAtTime(s, dir, afterV1) === 1L)
    assert(DataSkipping.versionAtTime(s, dir,
      System.currentTimeMillis() + 1000L) === 2L)
    assert(DataSkipping.readSkippingAtTime(s, dir, afterV0, lit(true))
      .count() === 1000L)
    assert(DataSkipping.readSkippingAtTime(s, dir, afterV1, lit(true))
      .count() === 900L)
    // an instant before the table existed is loud, like VERSION AS OF
    intercept[IllegalArgumentException] {
      DataSkipping.versionAtTime(s, dir, afterV0 - 3600L * 1000L)
    }

    // IN-COMMIT timestamps: a storage migration (cp -r, object-store
    // copy) rewrites every file's mtime — resolution must come from
    // the instant INSIDE _COMMIT, not the filesystem clock
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    (0L to 2L).foreach { v =>
      val c = new org.apache.hadoop.fs.Path(
        s"$dir/${DataSkipping.StatsDir}/v$v/_COMMIT")
      fs.setTimes(c, System.currentTimeMillis() + 86400000L, -1L)
    }
    assert(DataSkipping.versionAtTime(s, dir, afterV0) === 0L,
      "TIMESTAMP AS OF must survive an mtime-rewriting storage migration")
    assert(DataSkipping.versionAtTime(s, dir, afterV1) === 1L)
    assert(DataSkipping.readSkippingAtTime(s, dir, afterV1, lit(true))
      .count() === 900L)
  }

  test("in-commit timestamps are clamped monotonic across a clock regression") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (i, s"p$i")).toDF("id", "payload"),
      dir, Seq("id"))
    // simulate a clock that ran AHEAD when v0 committed (so "now" at
    // v1-commit time is a regression relative to it): rewrite v0's
    // in-commit instant one hour into the future
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val v0Commit = new org.apache.hadoop.fs.Path(
      s"$dir/${DataSkipping.StatsDir}/v0/${DataSkipping.CommitFile}")
    val future = System.currentTimeMillis() + 3600L * 1000L
    val out = fs.create(v0Commit, true)
    try out.write(future.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    DataSkipping.deleteWhere(s, dir, col("id") < 10L, vacuum = false) // v1
    // v1's instant must be clamped to v0's + 1, never the (earlier)
    // wall clock — otherwise `filter(_ <= ts).max` resolves an
    // instant at which v1 did not yet exist to v1
    assert(DataSkipping.versionAtTime(s, dir, future) === 0L)
    assert(DataSkipping.versionAtTime(s, dir, future + 1L) === 1L)
  }

  test("tableDetail summarizes files, rows, vector, versions, features and constraints") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 2000L).map(i => (i, i)).toDF("id", "v")
        .repartitionByRange(4, col("id")), dir, Seq("id", "v"),
      bloomCols = Nil, changeFeed = true)
    DataSkipping.addCheckConstraint(s, dir, "v_ok", "v >= 0")
    DataSkipping.deleteWhereDV(s, dir, col("id") < 50L)

    val d = DataSkipping.tableDetail(s, dir).head()
    assert(d.getAs[Long]("num_files") === 4L)
    assert(d.getAs[Long]("num_rows_physical") === 2000L)
    assert(d.getAs[Long]("dv_entries") === 50L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[Long]("earliest_version") === 0L)
    assert(d.getAs[Long]("latest_version") === 1L)
    assert(d.getAs[String]("features").contains("changefeed"))
    assert(d.getAs[String]("stats_columns") === "id,v")
    assert(d.getAs[Long]("num_constraints") === 1L)
    // visible rows = physical - vector
    assert(DataSkipping.countWhere(s, dir, lit(true)) ===
      d.getAs[Long]("num_rows_physical") - d.getAs[Long]("dv_entries"))
  }
}
