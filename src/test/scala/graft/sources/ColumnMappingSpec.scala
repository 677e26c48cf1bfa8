package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class ColumnMappingSpec extends SparkSpec {

  private def freshTable(prefix: String, changeFeed: Boolean = false): String = {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir(prefix)}/t"
    val df = (0L until 400L).map(i => (i, i % 40, s"e${i % 5}", i * 1.5))
      .toDF("event_id", "user_id", "event_type", "value")
    DataSkipping.writeWithStats(df.repartitionByRange(8, col("user_id")), t,
      Seq("user_id", "event_id"), bloomCols = Nil, changeFeed = changeFeed)
    t
  }

  private def dataFileState(t: String): Seq[(String, Long, Long)] = {
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(t)).filter(_.isFile)
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .toSeq.sortBy(_._1)
  }

  test("rename is metadata-only: zero data bytes touched, logical view updates in place") {
    val t = freshTable("graft_cm1")
    val before = dataFileState(t)
    DataSkipping.renameColumn(spark, t, "user_id", "uid")
    assert(dataFileState(t) == before)
    assert(DataSkipping.tableLogicalSchema(spark, t).fieldNames.toSeq ==
      Seq("event_id", "uid", "event_type", "value"))
    // physical schema unchanged underneath
    assert(DataSkipping.tableSchema(spark, t).fieldNames.toSeq ==
      Seq("event_id", "user_id", "event_type", "value"))
    val rows = DataSkipping.readSkipping(spark, t, col("uid") === 7L)
    assert(rows.columns.toSeq == Seq("event_id", "uid", "event_type", "value"))
    assert(rows.count() == 10L)
    // the old name is gone from the logical surface
    intercept[Exception] {
      DataSkipping.readSkipping(spark, t, col("user_id") === 7L).count()
    }
  }

  test("pruning still fires on a renamed column's logical predicate") {
    val t = freshTable("graft_cm2")
    DataSkipping.renameColumn(spark, t, "user_id", "uid")
    val (kept, all) = DataSkipping.prunedFiles(spark, t, col("uid") < 5L)
    assert(all.size == 8, s"${all.size}")
    assert(kept.size < all.size, s"kept ${kept.size} of ${all.size}")
    // metadata aggregates speak logical names too
    assert(DataSkipping.countWhere(spark, t, col("uid") < 5L) == 50L)
    val (mn, mx) = DataSkipping.minMaxWhere(spark, t, "uid", col("uid") < 5L)
    assert(mn.contains(0L) && mx.contains(4L))
  }

  test("drop hides the column immediately; a re-added name binds to a fresh physical column") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_cm3")
    DataSkipping.dropColumn(spark, t, "value")
    assert(DataSkipping.tableLogicalSchema(spark, t).fieldNames.toSeq ==
      Seq("event_id", "user_id", "event_type"))
    assert(!DataSkipping.readSkipping(spark, t, lit(true)).columns.contains("value"))
    // re-add the same logical name with different content
    val extra = Seq((9000L, 1L, "x", 777.0))
      .toDF("event_id", "user_id", "event_type", "value")
    DataSkipping.appendWithStats(extra, t, Seq("user_id", "event_id", "value"),
      mergeSchema = true)
    val back = DataSkipping.readSkipping(spark, t, lit(true))
    // old rows must read NULL for the re-added column — the dropped
    // values may never resurrect (Delta drop semantics)
    assert(back.filter(col("event_id") < 9000L && col("value").isNotNull).count() == 0L)
    assert(back.filter(col("event_id") === 9000L).select("value").head.getDouble(0) == 777.0)
    // physically the new column is a fresh name
    assert(DataSkipping.tableSchema(spark, t).fieldNames.contains("value__p1"))
    assert(DataSkipping.columnMapping(spark, t)("value") == "value__p1")
  }

  test("DML speaks logical names: delete/update/merge on a renamed table") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_cm4")
    DataSkipping.renameColumn(spark, t, "user_id", "uid")
    DataSkipping.renameColumn(spark, t, "value", "score")
    DataSkipping.deleteWhere(s, t, col("uid") < 2L)                    // -20 rows
    DataSkipping.updateWhere(s, t, col("uid") === 5L,
      Map("score" -> (col("score") + 1000.0)))
    val src = Seq((10000L, 3L, "m", 5.0), (5L, 3L, "m", 6.0))
      .toDF("event_id", "uid", "event_type", "score")
    DataSkipping.mergeUpsert(s, t, src, Seq("event_id"))               // 1 update + 1 insert
    val all = DataSkipping.readSkipping(s, t, lit(true))
    assert(all.count() == 381L)
    assert(all.filter(col("uid") === 5L && col("score") >= 1000.0).count() == 9L)
    assert(all.filter(col("event_id") === 10000L).select("score").head.getDouble(0) == 5.0)
    assert(all.filter(col("event_id") === 5L).select("event_type").head.getString(0) == "m")
    val del = Seq(Tuple1(10000L)).toDF("event_id")
    DataSkipping.mergeDelete(s, t, del, Seq("event_id"))
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() == 380L)
  }

  test("time travel reads a superseded version under ITS mapping; restore rewinds the names") {
    val t = freshTable("graft_cm5")
    DataSkipping.deleteWhere(spark, t, col("user_id") < 2L)            // v1
    DataSkipping.renameColumn(spark, t, "user_id", "uid")              // metadata on v1
    DataSkipping.deleteWhere(spark, t, col("uid") === 39L)             // v2, logical predicate
    // v0 predates the rename: its own sidecars have no mapping
    val v0 = DataSkipping.readSkippingAt(spark, t, 0L, col("user_id") === 1L)
    assert(v0.columns.contains("user_id") && v0.count() == 10L)
    // the live read shows the new name
    assert(DataSkipping.readSkipping(spark, t, lit(true)).columns.contains("uid"))
    // RESTORE to v0 restores the old logical names with the old rows
    DataSkipping.restoreTable(spark, t, 0L)
    val restored = DataSkipping.readSkipping(spark, t, lit(true))
    assert(restored.columns.contains("user_id"), restored.columns.mkString(","))
    assert(restored.count() == 400L)
  }

  test("change feed serves the current logical view across a rename") {
    val t = freshTable("graft_cm6", changeFeed = true)
    DataSkipping.deleteWhere(spark, t, col("user_id") === 3L)          // v1, pre-rename
    DataSkipping.renameColumn(spark, t, "user_id", "uid")
    DataSkipping.deleteWhere(spark, t, col("uid") === 4L)              // v2, post-rename
    val feed = DataSkipping.readChangeFeed(spark, t, 1L)
    assert(feed.columns.toSeq ==
      Seq("event_id", "uid", "event_type", "value", "_change_type", "_commit_version"))
    assert(feed.filter(col("_commit_version") === 1L && col("uid") === 3L).count() == 10L)
    assert(feed.filter(col("_commit_version") === 2L && col("uid") === 4L).count() == 10L)
  }

  test("constraints bind physically: rename keeps enforcement; dropping a constrained column is refused") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_cm7")
    DataSkipping.renameColumn(s, t, "user_id", "uid")
    // registered AGAINST THE LOGICAL NAME — stored physically
    DataSkipping.addCheckConstraint(s, t, "uid_ok", "uid < 1000")
    assert(DataSkipping.tableConstraints(s, t)("uid_ok").contains("user_id"))
    val bad = Seq((9999L, 5000L, "x", 0.0)).toDF("event_id", "uid", "event_type", "value")
    intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(bad, t, Seq("uid", "event_id"))
    }
    // a FURTHER rename of the constrained column keeps enforcing
    DataSkipping.renameColumn(s, t, "uid", "uid2")
    val bad2 = Seq((9999L, 5000L, "x", 0.0)).toDF("event_id", "uid2", "event_type", "value")
    intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(bad2, t, Seq("uid2", "event_id"))
    }
    val e = intercept[IllegalArgumentException] {
      DataSkipping.dropColumn(s, t, "uid2")
    }
    assert(e.getMessage.contains("uid_ok"))
    DataSkipping.dropCheckConstraint(s, t, "uid_ok")
    DataSkipping.dropColumn(s, t, "uid2")
    assert(!DataSkipping.tableLogicalSchema(s, t).fieldNames.contains("uid2"))
  }

  test("mapping rides OPTIMIZE and survives vacuum; streaming sources refuse a mapped table") {
    val t = freshTable("graft_cm8")
    DataSkipping.renameColumn(spark, t, "user_id", "uid")
    DataSkipping.compactTable(spark, t, targetFileBytes = 16L * 1024 * 1024)
    GraftSql.sql(spark, s"VACUUM '$t' RETAIN 0 HOURS")
    assert(DataSkipping.readSkipping(spark, t, col("uid") === 7L).count() == 10L)
    assert(DataSkipping.columnMapping(spark, t)("uid") == "user_id")
    // the graft data source serves the logical view with pruning intact
    val viaSource = spark.read.format("graft").load(t)
    assert(viaSource.columns.contains("uid"))
    assert(viaSource.filter(col("uid") === 7L).count() == 10L)
    // streaming refusal — Delta's no-schema-tracking rule
    val e = intercept[Exception] {
      new graft.streaming.StatsTableSource(
        spark.sqlContext, t)
    }
    assert(e.getMessage.contains("column mapping"), e.getMessage)
  }

  test("SQL surface: RENAME COLUMN / DROP COLUMN statements") {
    val t = freshTable("graft_cm9")
    assert(GraftSql.parse(s"ALTER TABLE '/x' RENAME COLUMN a TO b")
      .contains(RenameColumnGraftCommand("/x", "a", "b")))
    assert(GraftSql.parse(s"ALTER TABLE '/x' DROP COLUMN c")
      .contains(DropColumnGraftCommand("/x", "c")))
    GraftSql.sql(spark, s"ALTER TABLE '$t' RENAME COLUMN event_type TO etype")
    GraftSql.sql(spark, s"ALTER TABLE '$t' DROP COLUMN value")
    assert(DataSkipping.tableLogicalSchema(spark, t).fieldNames.toSeq ==
      Seq("event_id", "user_id", "etype"))
    // renaming to a name the table has already used physically is loud
    val e = intercept[IllegalArgumentException] {
      DataSkipping.renameColumn(spark, t, "etype", "value")
    }
    assert(e.getMessage.contains("physical"), e.getMessage)
  }
}
